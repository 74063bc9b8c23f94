// Exact-quantile-family forensic: outlier_mad (the suite's slowest key,
// adjudicated "collapse-bound" in r16-r18) and histogram_equidepth
// (ExactQuantiles' per-partition boundary collect) measured at 10× and
// 100× the sf0.1 fixture, through the PRODUCTION queries — a synthetic
// lineitem with the fixture's full schema is staged to parquet and the
// real SparkEntry keys run against it. The claim under test: the
// median-window input is the (flag, cent) DOMAIN, not the data — cents
// are bounded (qty ≤ 50 × bounded retail price ⇒ ~5M distinct), so as
// data grows 100× the window input saturates and per-row cost FALLS.
// Deterministic id-arithmetic data; same price shape as the fixture
// (qty 1..50 × retail 900.00..1910.00).
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 48g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/quantbench.scala < /dev/null
{
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.functions._

def stage(n: Long, dir: String): Unit = {
  if (!new java.io.File(s"$dir/lineitem.parquet/_SUCCESS").exists) {
    spark.range(n).select(
      (col("id") / 4).cast("long").as("l_orderkey"),
      pmod(col("id") * 2654435761L, lit(200000L)).as("l_partkey"),
      pmod(col("id") * 40503L, lit(10000L)).as("l_suppkey"),
      (col("id") % 7).cast("int").as("l_linenumber"),
      (lit(1) + pmod(col("id") * 31L, lit(50L))).cast("double").as("l_quantity"),
      // cents = qty × retail-cents, retail-cents in [90000, 191000) —
      // the fixture's bounded-domain shape (≲5M distinct cents)
      (((lit(1) + pmod(col("id") * 31L, lit(50L)))
        * (lit(90000L) + pmod(hash(col("id")), lit(101000L)))).cast("double") / 100.0)
        .as("l_extendedprice"),
      (pmod(col("id"), lit(11L)).cast("double") / 100.0).as("l_discount"),
      (pmod(col("id"), lit(9L)).cast("double") / 100.0).as("l_tax"),
      element_at(array(lit("A"), lit("N"), lit("R")), (pmod(col("id"), lit(3L)) + 1).cast("int"))
        .as("l_returnflag"),
      element_at(array(lit("F"), lit("O")), (pmod(col("id"), lit(2L)) + 1).cast("int"))
        .as("l_linestatus"),
      (lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))).as("l_shipdate"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
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
  println(f"QUANTBENCH $key%-20s $label%-6s med=${ts.sorted.apply(1)}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
}

stage(6000000L, "/tmp/quant_10x")
stage(60000000L, "/tmp/quant_100x")
for (key <- Seq("outlier_mad", "histogram_equidepth")) {
  timedKey(key, "/root/testdata/sf0.1", "1x")
  timedKey(key, "/tmp/quant_10x", "10x")
  timedKey(key, "/tmp/quant_100x", "100x")
}
}
sys.exit(0)
