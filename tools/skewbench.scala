// Skew-stress forensic: measures the SAME hot-key join under the four
// strategies the engine's scale story names (SCALE.md "Joins"), on data
// an order of magnitude past the bench fixtures. The claim under test:
// a 50%-hot key serialises a plain shuffle join into one straggler task,
// and each mitigation — AQE skew split, deterministic salting
// (graft.operators.SaltedJoin), small-side broadcast — restores
// parallelism. Deterministic synthetic data (spark.range + pmod, no
// rand()): BIG = 40M rows, half on key 0 and half spread over the 50k
// ODD residues of pmod(id, 100k) (odd id, even modulus ⇒ odd residue
// only — ~400 rows each; ADVICE r18 corrected the stated cardinality,
// the generator is unchanged so the recorded numbers still reproduce);
// DIM = 100k keys. Each scenario runs the identical join +
// combinable aggregate into a 1-row sink, 3 timed runs after one warm.
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/skewbench.scala < /dev/null
{
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.functions._
val N = 40000000L
val KEYS = 100000L
def big = spark.range(N).select(
  when(col("id") % 2 === 0, 0L).otherwise(pmod(col("id"), lit(KEYS))).as("k"),
  (col("id") % 1000).as("v"))
def dim = spark.range(KEYS).select(col("id").as("k"), (col("id") % 25).as("g"))
def timed(name: String)(f: => Unit): Unit = {
  f // warm (codegen; data is generated, nothing cached)
  val ts = (1 to 3).map { _ =>
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  println(f"SKEWBENCH $name%-22s med=${ts.sorted.apply(1)}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
}
def sink(df: org.apache.spark.sql.DataFrame): Unit =
  df.groupBy("g").agg(sum("v")).write.format("noop").mode("overwrite").save()
def withConf(kv: (String, String)*)(body: => Unit): Unit = {
  val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
  kv.foreach { case (k, v) => spark.conf.set(k, v) }
  try body finally old.foreach {
    case (k, Some(v)) => spark.conf.set(k, v)
    case (k, None) => spark.conf.unset(k)
  }
}
// 1. plain shuffle join, no mitigation: AQE off, broadcast off — the
//    hot key's 20M rows land in ONE sort-merge partition
withConf("spark.sql.adaptive.enabled" -> "false",
  "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
  timed("smj_serialized") { sink(big.join(dim, "k")) }
}
// 2. AQE skew split (the default production path): same join, AQE
//    splits the oversized partition at runtime
withConf("spark.sql.adaptive.enabled" -> "true",
  "spark.sql.adaptive.skewJoin.enabled" -> "true",
  "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
  "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
  "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m",
  "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
  timed("smj_aqe_skewsplit") { sink(big.join(dim, "k")) }
}
// 3. deterministic salting (graft.operators.SaltedJoin, salts=32):
//    works with AQE off and on any Spark — the explicit mitigation for
//    when AQE refuses (e.g. a downstream operator needs the join's
//    partitioning)
withConf("spark.sql.adaptive.enabled" -> "false",
  "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
  timed("salted_32") { sink(graft.operators.SaltedJoin.inner(big, dim, "k", 32)) }
}
// 4. broadcast of the 100k-row dim — the first-choice cure whenever the
//    small side is model-sized; skew becomes irrelevant (map-side join)
withConf("spark.sql.adaptive.enabled" -> "false") {
  timed("broadcast_dim") { sink(big.join(broadcast(dim), "k")) }
}
}
sys.exit(0)
