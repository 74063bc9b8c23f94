package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join: for each left row, attach the payload of the latest
  * right row with the same key and a strictly earlier ordering value.
  *
  * Spark has no native ASOF JOIN (DuckDB does). The naive rewrite —
  * equi-join on key plus `r.ts < l.ts`, then `row_number() = 1` — explodes
  * to O(|pairs|) and dies at 100 TB. This implementation is the standard
  * union-merge rewrite instead:
  *
  *   1. tag left rows side=0 and right rows side=1 carrying their payload,
  *   2. union them (one dataset, one schema),
  *   3. one window partitioned by key, ordered by (ts, side, tieBreak),
  *      `last(payload-struct, ignoreNulls = true)` over rows
  *      unbounded..current (one struct so the matched row attaches
  *      wholesale even when payload values are NULL),
  *   4. keep the left rows.
  *
  * Cost: ONE shuffle of |L| + |R| rows and a per-partition sort — the same
  * plan shape Spark uses for any window, so AQE/skew handling apply. At
  * equal ts the left row sorts BEFORE the right row (side 0 < 1), which
  * yields strict `r.ts < l.ts` semantics, matching DuckDB's
  * `ASOF JOIN ... ON r.ts < l.ts`.
  *
  * @param left      left (probe) side
  * @param right     right (reference) side
  * @param key       equi-join key column name (same name both sides)
  * @param ts        ordering column name (same name both sides, any
  *                  orderable type; use a BIGINT epoch for exact parity)
  * @param payload   right-side columns to attach (null when no match)
  * @param rightTie  right-side tie-break column for duplicate (key, ts)
  *                  rows — the greatest wins, deterministically
  */
object AsofJoin {
  def lastEarlier(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      rightTie: String,
  ): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    // the payload travels as ONE struct so a match attaches the matched
    // right row WHOLESALE — per-column last(ignoreNulls) would pick
    // different right rows for different columns when a payload value is
    // NULL, diverging from ASOF JOIN semantics (and one struct = one
    // window pass instead of N)
    val payloadType = StructType(payload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))

    val lPadded = left
      .withColumn("__side", lit(0))
      .withColumn("__tie", lit(null).cast(right.schema(rightTie).dataType))
      .withColumn("__asof", lit(null).cast(payloadType))

    val rTagged = right
      .withColumn("__side", lit(1))
      .withColumn("__tie", col(rightTie))
      .withColumn("__asof", struct(payload.map(col): _*))
    val rPadded = leftCols.filterNot(c => c == key || c == ts).foldLeft(rTagged) {
      case (df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unionCols: Seq[Column] =
      (leftCols ++ Seq("__side", "__tie", "__asof")).map(col)
    val unioned = lPadded.select(unionCols: _*)
      .unionByName(rPadded.select(unionCols: _*))

    // ASC by (ts, side): at equal ts the left row (side 0) precedes the
    // right row (side 1) and does NOT see it => strict r.ts < l.ts.
    val w = Window
      .partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned.withColumn("__asof",
      last(col("__asof"), ignoreNulls = true).over(w))

    val projected = leftCols.map(col) ++ payload.map(c =>
      col("__asof").getField(c).as(s"asof_$c"))
    filled
      .filter(col("__side") === 0)
      .select(projected: _*)
  }

  /** Nearest as-of join: for each left row, attach the right row with the
    * same key whose ordering value is CLOSEST in either direction
    * (strictly earlier or strictly later; equal ordering values match
    * neither side, mirroring `lastEarlier`'s strict semantics). Ties in
    * distance break toward the EARLIER candidate.
    *
    * Same union-merge shape as [[lastEarlier]] — tag, union, window — but
    * with TWO window passes over the SAME `partitionBy(key)`: ascending
    * (ts, side, tie) for the backward candidate and descending
    * (ts desc, side, tie desc) for the forward one. Identical partitioning
    * means Catalyst plans ONE exchange of |L| + |R| rows with two
    * per-partition sorts stacked on it — still no O(|pairs|) blow-up, so
    * the operator survives 100 TB exactly like the backward-only form.
    *
    * Determinism on duplicate (key, ts) right rows: backward keeps the
    * greatest `rightTie`, forward the least — both are the last row the
    * respective frame sees, pinned by the tie column in the sort, never by
    * physical row order.
    *
    * Output: every left column, `near_<payload>` columns from the chosen
    * right row (NULL when the key group has no other row), and
    * `near_dt` = absolute ordering distance (left-minus-right domain, so
    * use a BIGINT epoch for exact parity).
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      rightTie: String,
  ): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns.toSeq
    // ts rides inside the payload struct so the distance to the matched
    // row is computable without re-joining
    val payCols = (ts +: payload).distinct
    val payloadType = StructType(payCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))

    val lPadded = left
      .withColumn("__side", lit(0))
      .withColumn("__tie", lit(null).cast(right.schema(rightTie).dataType))
      .withColumn("__asof", lit(null).cast(payloadType))
    val rTagged = right
      .withColumn("__side", lit(1))
      .withColumn("__tie", col(rightTie))
      .withColumn("__asof", struct(payCols.map(col): _*))
    val rPadded = leftCols.filterNot(c => c == key || c == ts).foldLeft(rTagged) {
      case (df, c) =>
        if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unionCols: Seq[Column] =
      (leftCols ++ Seq("__side", "__tie", "__asof")).map(col)
    val unioned = lPadded.select(unionCols: _*)
      .unionByName(rPadded.select(unionCols: _*))

    // ASC pass: at equal ts the left row (side 0) precedes the right row,
    // so the frame up to the current row yields strict r.ts < l.ts.
    val wBack = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // DESC pass: same argument mirrored — equal-ts right rows still sort
    // AFTER the left row (side 0 < 1), so the frame yields strict
    // r.ts > l.ts; among ties the last row seen carries the LEAST tie.
    val wFwd = Window.partitionBy(key)
      .orderBy(col(ts).desc, col("__side").asc, col("__tie").desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = unioned
      .withColumn("__back", last(col("__asof"), ignoreNulls = true).over(wBack))
      .withColumn("__fwd", last(col("__asof"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 0)
      .withColumn("__bdt", col(ts) - col("__back").getField(ts))
      .withColumn("__fdt", col("__fwd").getField(ts) - col(ts))
      .withColumn("__near",
        when(col("__back").isNotNull &&
            (col("__fwd").isNull || col("__bdt") <= col("__fdt")), col("__back"))
          .otherwise(col("__fwd")))
      .withColumn("__ndt",
        when(col("__back").isNotNull &&
            (col("__fwd").isNull || col("__bdt") <= col("__fdt")), col("__bdt"))
          .otherwise(col("__fdt")))

    val projected = leftCols.map(col) ++ payload.map(c =>
      col("__near").getField(c).as(s"near_$c")) :+ col("__ndt").as("near_dt")
    filled.select(projected: _*)
  }
}
