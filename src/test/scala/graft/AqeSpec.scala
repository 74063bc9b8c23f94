package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution evidence: the two runtime re-plans a 100 TB
  * job leans on — skew-join splitting (the implicit counterpart of the
  * explicit `join_skew_salted` operator) and post-shuffle partition
  * coalescing — actually fire on this engine's session settings, pinned
  * from the ADAPTIVE executed plan, with results identical to the static
  * plan.
  */
class AqeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => s.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    import s.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the sf-test-sized hot key counts as skew
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    ) {
      // one pathological key (100k rows of k=0) + a uniform tail; the
      // right side is small but broadcast is pinned off, so the join
      // shuffles on k and partition hash(0) dwarfs the others
      // v is hash-mixed so shuffle-write compression cannot shrink the
      // hot partition below the skew threshold (sequential longs + a
      // constant key LZ4 down to almost nothing)
      val big = s.range(100000)
        .select(lit(0L).as("k"), expr("xxhash64(id)").as("v"))
        .union(s.range(2000)
          .select((col("id") % 50 + 1).as("k"), expr("xxhash64(id)").as("v")))
      val right = s.range(51).select(col("id").as("k"), (col("id") * 7).as("w"))
      // NOTE 1: aggregate WITHOUT the join key — a groupBy(k) downstream
      // would reuse the join's hash partitioning, and AQE (correctly)
      // refuses to split skewed partitions when that breaks a required
      // distribution (forceOptimizeSkewedJoin stays default-off).
      // NOTE 2: sum(v) keeps the incompressible v column in the shuffle —
      // column pruning would otherwise reduce the hot partition to 100k
      // compressed CONSTANT keys (~12.7 KB measured), under any sane
      // skew threshold
      // v % 1000 is evaluated ABOVE the join (no rule pushes compute
      // through a join), so the full 8-byte v crosses the shuffle while
      // the ANSI sum stays overflow-free
      val j = big.join(right, "k")
        .agg(count(lit(1)).as("n"), sum("w").as("sw"),
          sum(col("v") % 1000).as("sv"))
      val row = j.collect().head
      // adaptive executed plan: the SMJ must be marked skew-handled
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan isFinalPlan=true"), plan.take(2000))
      assert(plan.contains("skew=true"),
        s"skew join split did not fire:\n${plan.take(4000)}")
      assert(row.getLong(0) == 102000L)
      // sum(w): hot key contributes 0 each; tail key k -> w = 7k, 40 rows each
      assert(row.getLong(1) == (1L to 50L).map(_ * 7 * 40).sum)
    }
  }

  test("AQE coalesces post-shuffle partitions on small data") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.shuffle.partitions" -> "32",
    ) {
      val agg = Tables.orders(s, TestSpark.sf)
        .groupBy("o_custkey").agg(sum("o_totalprice").as("t"))
      val n = agg.rdd.getNumPartitions
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("coalesced") || n < 32,
        s"expected runtime partition coalescing, got $n partitions:\n${plan.take(3000)}")
      assert(n < 32, s"still $n output partitions")
    }
  }
}
