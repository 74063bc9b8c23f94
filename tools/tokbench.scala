// Tokenizer-trainer forensic: bpe_train's scale claim measured. The
// claim (Stats.scala scaladoc): the corpus is aggregated ONCE into the
// (token, count) vocabulary and every merge round runs over that
// VOCAB-BOUNDED layer — so at 100 TB the trainer is one stream
// aggregation plus 6 dictionary rounds, not 6 corpus scans. If that is
// true, wall grows far slower than the corpus once the vocabulary
// saturates. Staged synthetic documents with the fixture's full schema
// (5k fixture docs → 50k → 500k, i.e. 10× and 100× sf0.1), words drawn
// from a FIXED 30k-word vocabulary by aperiodic murmur3 (the dictionary
// a real corpus converges to; the dedupbench/annbench generator traps
// documented there apply here too), run through the PRODUCTION
// bpe_train and token_vocab keys.
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/tokbench.scala < /dev/null
{
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.functions._

def stage(n: Long, dir: String): Unit = {
  if (!new java.io.File(s"$dir/documents.parquet/_SUCCESS").exists) {
    spark.range(n).select(
      col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(0, 39),
        |  w -> concat('t', pmod(hash(id, w), 30000))))""".stripMargin).as("text"),
      lit("en").as("lang"),
      element_at(array(lit("web"), lit("book"), lit("code")),
        (pmod(col("id"), lit(3L)) + 1).cast("int")).as("source"),
      lit(200L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }
}

def timedKey(key: String, dir: String, label: String): Unit = {
  graft.SparkEntry.queries(key)(spark, dir).write.format("noop").mode("overwrite").save()
  spark.catalog.clearCache()
  val ts = (1 to 3).map { _ =>
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(key)(spark, dir).write.format("noop").mode("overwrite").save()
    val e = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache(); e
  }
  println(f"TOKBENCH $key%-14s $label%-6s med=${ts.sorted.apply(1)}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
}

stage(50000L, "/tmp/tok_10x")
stage(500000L, "/tmp/tok_100x")
for (key <- Seq("bpe_train", "token_vocab")) {
  timedKey(key, "/root/testdata/sf0.1", "1x")
  timedKey(key, "/tmp/tok_10x", "10x")
  timedKey(key, "/tmp/tok_100x", "100x")
}
}
sys.exit(0)
