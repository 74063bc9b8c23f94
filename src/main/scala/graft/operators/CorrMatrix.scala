package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass Pearson correlation matrix over k integer-valued columns —
  * the profiling/collinearity audit behind the `stats_corr_matrix` query,
  * exposed generically: any frame, any column count.
  *
  * Exactness contract: the caller snaps measures to integers FIRST
  * (cents, percent points, counts — the caller owns the units); every
  * moment is then an exact sum — per-row products in int64, accumulated
  * as DECIMAL(38,0) — so `cov_n2` (= n²·covariance, the cross-multiplied
  * integer that needs no division) is engine-exact and order-independent.
  * `r6` is presentation only: huge-integer→double casts and sqrts with a
  * fixed expression shape; inputs carry ≤ 2⁻⁴⁰ relative conversion error
  * against the round(,6) bucket (the ln-family ulp-margin argument).
  *
  * Scale shape: ONE map-side-combinable aggregate over the fact table to
  * a single (1 + k + k(k+1)/2)-number row; the k(k−1)/2-row pair matrix
  * is an `explode` of that row — no joins, no second pass, and the only
  * exchange is the 1-row final aggregation merge. Int64 bound: per-row
  * products must fit int64 (|x|·|y| < 9.2×10¹⁸ — e.g. cents up to ~3×10⁹
  * squared); the DECIMAL(38,0) accumulators then hold to ~10³⁸ total.
  */
object CorrMatrix {

  /** Pair rows (col_x, col_y, n, cov_n2, r6) for every unordered column
    * pair of `cols` (named pairs follow `cols` order, col_x before
    * col_y), ordered by (col_x, col_y). `cols` must be integer-valued
    * (anything castable to BIGINT without loss — see the exactness
    * contract above).
    */
  def of(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val k = cols.size
    val b = df.select(cols.zipWithIndex.map { case (c, i) =>
      col(c).cast("long").as(s"x${i + 1}") }: _*)
    val sumCols = (1 to k).map(i =>
        sum(expr(s"cast(x$i as decimal(38,0))")).as(s"s$i")) ++
      (for (i <- 1 to k; j <- i to k)
        yield sum(expr(s"cast(x$i * x$j as decimal(38,0))")).as(s"q${i}_$j"))
    val aggs = count(lit(1)).as("n") +: sumCols
    val m = b.agg(aggs.head, aggs.tail: _*)
    def term(i: Int, j: Int) =
      s"cast(n as decimal(38,0)) * q${i}_$j - s$i * s$j"
    val pairs = for (i <- 1 to k; j <- (i + 1) to k) yield struct(
      lit(cols(i - 1)).as("col_x"), lit(cols(j - 1)).as("col_y"),
      col("n").as("n"),
      expr(s"cast(${term(i, j)} as decimal(38,0))").as("cov_n2"),
      expr(s"round(cast(${term(i, j)} as double)" +
        s" / (sqrt(cast(${term(i, i)} as double))" +
        s" * sqrt(cast(${term(j, j)} as double))), 6)").as("r6"))
    m.select(explode(array(pairs: _*)).as("p")).select("p.*")
      .orderBy("col_x", "col_y")
  }
}
