// RangePrefixSum forensic (VERDICT r19 item 4 adjudication): the r20
// interval_concurrency re-plan claims the range-partitioned two-pass
// prefix sum beats the partition-less window EXACTLY where the verdict
// flagged the risk — a minute domain that grows with wall-clock span
// (~526k minutes/year; a 10-year corpus pushes ~5.26M rows through ONE
// WindowExec task under the old shape). This measures both shapes on
// synthetic sweep-line delta frames at 1 year and 10 years of minutes
// (deterministic id arithmetic, no rand()), checks the running sums
// agree row-for-row (order-insensitive digest), and times 3 runs each
// through a noop sink (clearCache between prefix runs so every run pays
// the pin, as the production key does under Verify's clearCache).
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 16g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --jars target/scala-2.13/sd2_drp_experimentgenspark_2.13-0.1.0.jar \
//     -I tools/prefixsumbench.scala < /dev/null
{
spark.sparkContext.setLogLevel("ERROR")
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

def deltas(nMinutes: Long) = spark.range(nMinutes)
  .select(col("id").as("minute"),
    // deterministic sweep-line-like deltas in [-4, 5]
    expr("cast((id * 2654435761) % 10 - 4 as decimal(38,0))").as("d"))

def timed(name: String)(f: => Unit): Unit = {
  f // warm
  val ts = (1 to 3).map { _ =>
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  println(f"PSBENCH $name%-26s med=${ts.sorted.apply(1)}%.2f s runs=${ts.map(t => f"$t%.2f").mkString(",")}")
}

for (years <- Seq(1, 10)) {
  val n = 526000L * years
  val src = deltas(n)

  def windowShape = src
    .withColumn("conc", sum("d").over(Window.orderBy("minute")))
    .select(col("minute"), col("conc").cast("bigint").as("conc"))
  def prefixShape = {
    val (c, _) = graft.operators.RangePrefixSum.withRunningSum(
      src, Seq(col("minute")), "d", "conc")
    c.select(col("minute"), col("conc").cast("bigint").as("conc"))
  }

  // correctness cross-check: identical running sums — minute is unique,
  // so an order-insensitive digest over per-row xxhash64(minute, conc)
  // suffices; the NON-LINEAR per-row hash means compensating conc
  // errors (e.g. two equal-sized partitions with swapped offsets, which
  // a linear sum-digest cancels out of) cannot collide
  val dg = (df: org.apache.spark.sql.DataFrame) => df
    .agg(sum(expr("cast(xxhash64(minute, conc) as decimal(38,0))")))
    .collect()(0).getDecimal(0)
  val dw = dg(windowShape)
  val dp = dg(prefixShape)
  spark.catalog.clearCache()
  println(s"PSBENCH years=$years rows=$n digest_equal=${dw == dp} ($dw)")

  timed(f"window_single_task_y$years") {
    windowShape.write.format("noop").mode("overwrite").save()
  }
  timed(f"range_prefix_sum_y$years") {
    prefixShape.write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
  }
}
}
sys.exit(0)
