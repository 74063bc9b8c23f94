package graft.queries

/** Shared SQL fragments used identically on the Spark side (via `expr`) and
  * the DuckDB oracle side, so both engines compute bit-identical values
  * (SURVEY.md §7.3 hash-match discipline).
  *
  * Money/measure aggregation rule: per-row arithmetic stays in DOUBLE
  * (IEEE-exact and association-stable when parenthesised identically),
  * each row value is quantised to DECIMAL(18,6) — scale 6 because fixture measures have ≤2 decimal digits, so 3-factor products have exactly ≤6: the cast is then EXACT (no rounding), sidestepping Java-HALF_UP vs DuckDB-binary tie divergence, the SUM runs in exact
  * decimal arithmetic (order-independent), and only the final value is cast
  * back to DOUBLE. This avoids both cross-partition double-summation
  * nondeterminism and decimal-precision-overflow divergence between engines.
  */
object Sqlh {
  /** Exact, order-independent sum of a double expression. */
  def dsum(e: String): String =
    s"cast(sum(cast(($e) as decimal(18,6))) as double)"

  /** Deterministic average: exact decimal sum, ONE final double division. */
  def davg(e: String): String =
    s"cast(sum(cast(($e) as decimal(18,6))) as double) / count(*)"

  val revenue = "l_extendedprice * (1 - l_discount)"
  val charge  = "(l_extendedprice * (1 - l_discount)) * (1 + l_tax)"
}
