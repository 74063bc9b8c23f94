package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-side data layout for scan-time file skipping — the discipline that
  * decides how much of 100 TB a query actually reads. Parquet scans prune
  * with per-file (and per-row-group) min/max statistics; those stats are
  * only selective when the writer CLUSTERS rows so each file covers a
  * narrow key range. Two layouts:
  *
  *  - [[writeRangeSorted]]: global range partition + in-file sort on ONE
  *    key — optimal skipping for predicates on that key, the right default
  *    for time-series fact tables (cluster by event time).
  *  - [[writeZOrdered]]: interleave the bits of TWO keys into a z-value and
  *    range-sort on it — each file then covers a small RECTANGLE in
  *    (a, b) space, so predicates on either key (or both) skip; the
  *    standard multi-dimensional layout (public: Morton order, used by
  *    Delta/Iceberg `ZORDER BY`).
  *
  * Both cap file size via `maxRecordsPerFile` (spill-bounded readers) and
  * use `repartitionByRange`, whose range boundaries come from a
  * distributed sample — no driver materialization, skew handled by the
  * sampler. LayoutSpec measures the payoff: per-file bounding boxes and
  * the fraction of files a box query may skip under each layout.
  */
object Layout {

  /** Morton z-value of two non-negative BIGINT keys, `bits` low bits each,
    * built from shift/mask/or terms only — exact integer math, identical
    * on any engine, codegen-friendly (no UDF). Keys wider than `bits` bits
    * must be pre-bucketed by the caller (e.g. `ts_us >> 26` for ~67 s time
    * buckets); the companion [[zvalueSql]] emits the same formula as ANSI
    * SQL so the computation is oracle-checkable.
    */
  def zvalue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The identical z-value formula as engine-neutral SQL (DuckDB and Spark
    * both parse `&`, `|`, `>>`, `<<` with BIGINT semantics). */
  def zvalueSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap(i => Seq(
      s"((($a >> $i) & 1) << ${2 * i})",
      s"((($b >> $i) & 1) << ${2 * i + 1})",
    )).mkString(" | ")

  /** One-dimensional clustering: range-repartition on `sortCol` into
    * `files` output tasks, sort within each, bound file length. After
    * this, a predicate on `sortCol` touches ~(selectivity × files) files.
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String,
      files: Int, maxRecordsPerFile: Long = 1L << 22): Unit =
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(path)

  /** Two-dimensional clustering: z-value range sort. The z column is
    * dropped before writing — it is a layout device, not data; stats on
    * the ORIGINAL columns do the skipping at read time.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      bits: Int, files: Int, maxRecordsPerFile: Long = 1L << 22): Unit =
    df.withColumn("__z", zvalue(a, b, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(path)
}
