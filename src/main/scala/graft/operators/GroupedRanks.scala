package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Doubled average ranks over a weighted value domain, computed with the
  * range-partitioned prefix-sum shape — the documented physical swap for
  * the RANGE-framed window form `stats_spearman` uses (its doc-comment:
  * "a deployment with few giant groups would swap the domain windows for
  * the ExactQuantiles-style range-partitioned rank — the moments and
  * outputs are unchanged"). This operator makes that claim executable:
  * OperatorsSpec proves both forms produce bit-identical ranks on the
  * real fixture and on adversarial synthetic ties.
  *
  * Definition: for a value v in a group with per-value weight c(v), the
  * DOUBLED average rank is 2·avgrank(v) = 2·cum(≤v) − c(v) + 1 — an exact
  * integer under ties (min position + max position of the tie run), which
  * is what keeps Spearman/rank-moment arithmetic in exact integers.
  *
  * Physical shape: the per-(group, value) weights range-repartition on
  * (group, value) and take ONE distributed running sum
  * ([[RangePrefixSum]] — every stage parallel, one BigDecimal per
  * partition on the driver); per-group start offsets come from a
  * |groups|-row window (bounded by the GROUP count, which is the regime
  * this operator exists for: few giant groups, where the window form
  * serializes each group's whole domain into one task). The window form
  * is the better plan when groups are many and small — pick per
  * deployment; the outputs are identical by construction.
  */
object GroupedRanks {

  /** (group, value, c, r2) per distinct (group, value): c = total weight,
    * r2 = doubled average rank of `value` within `group` under weight
    * `weight`. `value` must be integer-valued; weights are summed
    * exactly in DECIMAL(38,0).
    */
  def doubled(df: DataFrame, group: String, value: String,
      weight: String): DataFrame = {
    val m = df.groupBy(group, value)
      .agg(sum(weight).cast("decimal(38,0)").as("c0"))
    // one distributed running sum under the (group, value) total order
    val (withCum, _) = RangePrefixSum.withRunningSum(
      m, Seq(col(group), col(value)), "c0", "gcum")
    // per-group exclusive start offsets: a |groups|-row frame — bounded
    // by group cardinality, never by the value domain
    val offsets = m.groupBy(group).agg(sum("c0").as("gtot"))
      .withColumn("goff", coalesce(
        sum("gtot").over(Window.orderBy(group)
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(java.math.BigDecimal.ZERO)))
      .select(col(group), col("goff"))
    withCum.join(broadcast(offsets), group)
      .select(col(group), col(value),
        col("c0").cast("bigint").as("c"),
        expr("cast(2 * (gcum - goff) - c0 + 1 as bigint)").as("r2"))
  }

  /** Convenience: SparkSession-free equality twin of the window form used
    * by `stats_spearman` (RANGE unbounded..current minus the tie group),
    * for specs that assert the swap is exact.
    */
  def doubledWindowForm(df: DataFrame, group: String, value: String,
      weight: String): DataFrame = {
    val m = df.groupBy(group, value).agg(sum(weight).as("c0"))
    val o = Window.partitionBy(group).orderBy(value)
    m.select(col(group), col(value),
      col("c0").cast("bigint").as("c"),
      (lit(2) * sum("c0").over(o.rangeBetween(Window.unboundedPreceding, Window.currentRow)) -
        col("c0") + 1).cast("bigint").as("r2"))
  }
}
