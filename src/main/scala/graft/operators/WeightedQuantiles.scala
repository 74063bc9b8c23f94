package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact weighted quantiles over a bounded value domain — the
  * cross-multiplied cumulative-weight idiom behind `agg_weighted_median`
  * and `events_interarrival`, factored into one public operator so the
  * shape is written (and audited) once.
  *
  * Definition: the lower weighted p-quantile (p = num/den) of integer
  * values v with non-negative integer weights w is the smallest v whose
  * cumulative weight reaches p of the group total — selected by the EXACT
  * integer predicate `den·cw ≥ num·tw`. No division, no doubles: both
  * engines of a cross-engine parity gate agree bit-for-bit, and the
  * result is invariant to partitioning because cw is defined by the value
  * ORDER, not arrival order.
  *
  * Scale shape (the reason this beats a per-row cumulative window): the
  * fact table collapses FIRST through one map-side-combinable aggregate
  * onto the (group, value) DOMAIN — for snapped measures (cents, counts,
  * bucketed gaps) that domain is bounded regardless of corpus size — and
  * the cumulative/total windows then run per group on the domain table
  * over ONE hash exchange. A naive `sum(w) OVER (ORDER BY v)` at fact
  * grain would sort the whole table (single-task without a partition);
  * this never touches fact rows after the first aggregate. Groups whose
  * value domain is itself huge (near-unique values) should range-reduce
  * first or use [[ExactQuantiles]] / [[RangePrefixSum]] — the
  * domain-window shape serializes per group on the domain size.
  *
  * Int64 bound: the predicate cross-products hold while den·tw fits int64
  * (~5×10¹⁷ cents of total weight at den = 4); past that, pre-cast the
  * weight sums to DECIMAL(38,0) — the shape is unchanged.
  */
object WeightedQuantiles {

  /** The cumulative-weight DOMAIN frame: input rows at any grain carrying
    * (`group`, `value`, `weight`); output one row per (group, value) with
    * `w` (domain weight), `cw` (cumulative weight in value order, ties
    * merged by the domain reduction) and `tw` (group total). Both window
    * columns share the single exchange on `group`.
    */
  def cumulated(df: DataFrame, group: String, value: String,
      weight: String): DataFrame = {
    val g = df.groupBy(group, value).agg(sum(weight).as("w"))
    g.withColumn("cw", sum("w").over(Window.partitionBy(group).orderBy(value)))
      .withColumn("tw", sum("w").over(Window.partitionBy(group)))
  }

  /** `min(value) where den·cw ≥ num·tw` — the exact lower weighted
    * num/den-quantile as an aggregate over a [[cumulated]] frame; compose
    * it freely with other aggregates (sums, min/max) in one `agg`.
    */
  def quantileAgg(value: String, num: Int, den: Int): Column = {
    require(num >= 0 && den > 0 && num <= den, s"quantile $num/$den out of [0,1]")
    min(when(expr(s"$den * cw >= $num * tw"), col(value)))
  }

  /** One row per group: `w_total` plus the requested lower quantiles,
    * `ps` as (num, den, outputName), ordered by group.
    */
  def of(df: DataFrame, group: String, value: String, weight: String,
      ps: Seq[(Int, Int, String)]): DataFrame = {
    require(ps.nonEmpty, "at least one quantile")
    val c = cumulated(df, group, value, weight)
    val aggs = max("tw").as("w_total") +:
      ps.map { case (n, d, out) => quantileAgg(value, n, d).as(out) }
    c.groupBy(group).agg(aggs.head, aggs.tail: _*).orderBy(group)
  }
}
