package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-aware readers for the driver-generated parquet tables
  * (TESTDATA.md / FIXTURES.md). One parquet file per table per sf dir.
  *
  * Scale note: these are plain `spark.read.parquet` scans so Catalyst keeps
  * full pushdown (PushedFilters / ReadSchema) — on a real cluster the same
  * code reads a partitioned directory tree and partition pruning applies
  * unchanged. Never collect(); never assume one partition.
  */
object Tables {

  /** Inferred-schema memo per parquet path. Schema inference costs ~100 ms
    * per `spark.read.parquet` call (footer fetch + conversion) — measured
    * r10 vs ~15 ms with an explicit schema — and Bench/Verify construct
    * each table reader hundreds of times across the suite. The fixture
    * dirs are immutable for the life of a JVM, so the first successful
    * inference per path is authoritative. The cached schema IS the
    * inferred one (identical nullability), so supplying it changes nothing
    * but the construction cost. Cleared never: entries are per-path, and
    * staged/mutable layouts (Sources.*) do not go through this reader.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.putIfAbsent(path, df.schema)
      df
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS) which stock Spark 4.1.2
    * rejects (PARQUET_TYPE_ILLEGAL). Verified workaround (SURVEY.md §1.2):
    * read nanos as long, derive
    *   - `ts_us`  : BIGINT microseconds (integer `div`, never `/1000` —
    *                double division loses ULPs at 1.7e18 ns), and
    *   - `ts_ntz` : TIMESTAMP_NTZ at microsecond precision.
    * This truncation matches DuckDB 1.0, which silently reads the same
    * column µs-truncated — so every oracle comparison runs in the µs domain.
    * The conf is set here (idempotent) because Verify/Bench build their own
    * sessions.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // guard the set: SET on an already-true conf still bumps session-state
    // modification tracking on every one of the ~40 events-reading queries
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") != Some("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_ntz", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
  }
}
