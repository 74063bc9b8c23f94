// sim_sparse_cosine scale forensic (VERDICT r18 item 1 adjudication, the
// outlier_mad standard): the r19 single-pass kernel's scale claim is that
// wall grows AT MOST linearly in fact rows — the lineitem⋈orders scan and
// the one groupBy(p) dominate, while the only pair-forming step is df-
// capped (≤ df(df+1)/2 ≤ 210 exploded rows per part, linear in parts,
// never all-pairs over customers). This tool runs the PRODUCTION key at
// 1×/10×/100× the sf0.1 fact volume on deterministic synthetic purchase
// data whose rare-part structure persists across scales (parts domain
// grows with N at ~3 lineitem rows per part, so the df ∈ [2,20] band
// stays populated — the regime that maximizes pair volume per row).
// Expected shape: med(100×)/med(10×) ≲ 10 (per-row cost flat or falling
// as fixed overheads amortize); a superlinear step would flag a hidden
// pair blow-up.
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/sparsecosbench.scala < /dev/null
{
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.functions._

// full fixture schemas so Tables' loaders see the shapes they expect;
// only (l_orderkey, l_partkey, o_orderkey, o_custkey) carry signal
def stage(n: Long, dir: String): Unit = {
  if (!new java.io.File(s"$dir/lineitem.parquet/_SUCCESS").exists) {
    val parts = n / 3       // ~3 rows/part -> df 2..20 band stays populated
    val custs = n / 50
    spark.range(n).select(
      (col("id") / 4).cast("long").as("l_orderkey"),
      pmod(col("id") * 2654435761L, lit(parts)).as("l_partkey"),
      pmod(col("id") * 40503L, lit(10000L)).as("l_suppkey"),
      (col("id") % 7).cast("int").as("l_linenumber"),
      (lit(1) + pmod(col("id") * 31L, lit(50L))).cast("double").as("l_quantity"),
      ((lit(90000L) + pmod(hash(col("id")), lit(101000L))).cast("double") / 100.0)
        .as("l_extendedprice"),
      (pmod(col("id"), lit(11L)).cast("double") / 100.0).as("l_discount"),
      (pmod(col("id"), lit(9L)).cast("double") / 100.0).as("l_tax"),
      element_at(array(lit("A"), lit("N"), lit("R")), (pmod(col("id"), lit(3L)) + 1).cast("int"))
        .as("l_returnflag"),
      element_at(array(lit("F"), lit("O")), (pmod(col("id"), lit(2L)) + 1).cast("int"))
        .as("l_linestatus"),
      (lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))).as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    spark.range(n / 4 + 1).select(
      col("id").as("o_orderkey"),
      pmod(col("id") * 982451653L, lit(custs)).as("o_custkey"),
      element_at(array(lit("F"), lit("O"), lit("P")), (pmod(col("id"), lit(3L)) + 1).cast("int"))
        .as("o_orderstatus"),
      (pmod(hash(col("id")), lit(5000000L)).cast("double") / 100.0).as("o_totalprice"),
      (lit(java.sql.Timestamp.valueOf("1995-06-01 00:00:00"))).as("o_orderdate"),
      lit("3-MEDIUM").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
  }
}

def timedKey(dir: String, label: String): Unit = {
  graft.SparkEntry.queries("sim_sparse_cosine")(spark, dir)
    .write.format("noop").mode("overwrite").save()
  spark.catalog.clearCache()
  val ts = (1 to 3).map { _ =>
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("sim_sparse_cosine")(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val e = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache(); e
  }
  val rows = graft.SparkEntry.queries("sim_sparse_cosine")(spark, dir).count()
  spark.catalog.clearCache()
  println(f"SPARSECOS $label%-6s med=${ts.sorted.apply(1)}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")} out_pairs=$rows")
}

stage(600000L, "/tmp/sparsecos_1x")
stage(6000000L, "/tmp/sparsecos_10x")
stage(60000000L, "/tmp/sparsecos_100x")
timedKey("/tmp/sparsecos_1x", "1x")
timedKey("/tmp/sparsecos_10x", "10x")
timedKey("/tmp/sparsecos_100x", "100x")
}
