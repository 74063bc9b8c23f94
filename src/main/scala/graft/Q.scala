package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named query over the sf-dir tables, optionally
  * paired with ANSI SQL that DuckDB 1.0 runs on the same parquet for the
  * driver's hash-compare (SURVEY.md §2 contract).
  *
  * Oracle-parity discipline (SURVEY.md §7.3): every oracled query ends in a
  * deterministic total ORDER BY, aggregates money in DECIMAL and casts the
  * final value to DOUBLE, rounds float outputs, and never uses
  * rand()/dropDuplicates/approx-sketches/dayofweek or implicit pivot domains.
  */
final case class Q(
    key: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

object Q {
  /** Convenience constructor for an oracled query. */
  def apply(key: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(key, fn, Some(oracle))
}
