package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketed tables — the write-once/join-many shuffle
  * elimination a 100 TB fact-to-fact join lives on. Both sides are written
  * `bucketBy(8, orderkey)` + `sortBy(orderkey)`; Spark's bucketing then
  * satisfies the sort-merge join's distribution requirement from the
  * FILES, so the join plans with ZERO Exchange nodes — and with one file
  * per bucket the in-file sort satisfies the ordering requirement too.
  * Result parity vs the plain (shuffled) join is asserted exactly.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  /** Drop the table AND its managed location — a crashed previous run can
    * leave the directory behind after the catalog entry is gone, which
    * fails the next CREATE with LOCATION_ALREADY_EXISTS.
    */
  private def dropHard(name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(s"target/spark-warehouse/$name")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }

  test("bucketed fact-fact join plans with zero exchanges and exact parity") {
    val prevThresh = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the shuffle-join regime the test is about (sf0.001 dims would
    // otherwise broadcast and trivially show no exchange), and keep the
    // planner from falling back to a plain scan at this tiny size — the
    // auto heuristic treats sf0.001 as too small to bother with buckets
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    dropHard("b_orders"); dropHard("b_lineitem")
    try {
      Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(1) // one file per bucket -> in-file sortBy order holds
        .write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
        .repartition(1)
        .write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")

      val j = s.table("b_orders").join(s.table("b_lineitem"),
          expr("o_orderkey = l_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      val plan = j.queryExecution.executedPlan.toString
      // join side: bucketing must satisfy the SMJ distribution — the only
      // allowed exchange is the one the o_custkey re-aggregation needs
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey")
        && !plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"bucketed join still shuffles a join side:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ regime:\n$plan")
      // bucket pruning metadata is recorded on the scan
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")

      // exact parity with the plain shuffled join
      val flat = Tables.orders(s, d).join(Tables.lineitem(s, d),
          expr("o_orderkey = l_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      val got = j.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      val exp = flat.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
      assert(got == exp && got.nonEmpty)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      s.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      dropHard("b_orders"); dropHard("b_lineitem")
    }
  }

  test("bucket pruning: an equality predicate scans one bucket's files") {
    s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    dropHard("bp_orders")
    try {
      Tables.orders(s, d).select("o_orderkey", "o_totalprice")
        .repartition(1)
        .write.format("parquet").bucketBy(8, "o_orderkey")
        .mode("overwrite").saveAsTable("bp_orders")
      val q = s.table("bp_orders").filter(col("o_orderkey") === 32L)
      val plan = q.queryExecution.executedPlan.toString
      // SelectedBucketsCount: 1 out of 8 proves the planner pruned files
      // by the bucket hash, not post-scan filtering
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning absent:\n$plan")
      val exp = Tables.orders(s, d).filter(col("o_orderkey") === 32L).count()
      assert(q.count() == exp)
    } finally {
      s.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      dropHard("bp_orders")
    }
  }
}
