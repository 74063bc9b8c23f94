package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
    * KNOWN LIMIT: if a fixture file is regenerated with a different
    * encoding MID-JVM, the memo serves the stale schema until restart —
    * acceptable because the guard below catches the drift on the next
    * fresh JVM with one actionable error instead of N cryptic ones
    * (exactly what happened when events.ts changed encoding between
    * rounds 10 and 11).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Fixture fingerprint guard: the column names (and, for drift-prone
    * columns, the set of acceptable Spark types) each reader relies on.
    * Checked once per path, at first inference. When the driver
    * regenerates a fixture with a new encoding, this fails FAST with one
    * actionable message naming the table/column and both types — instead
    * of dozens of identical analysis errors deep inside queries (the
    * round-10 failure mode: events.ts silently moved from
    * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and 35 queries crashed).
    * Types are intentionally loose where ingestion legitimately branches
    * (events.ts) and name-only elsewhere — the goal is a clear tripwire,
    * not a frozen schema.
    */
  private val expectedColumns: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label")
  )

  private def guardSchema(name: String, path: String, schema: StructType): Unit =
    expectedColumns.get(name).foreach { want =>
      val have = schema.fieldNames.toSet
      val missing = want.filterNot(have)
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"Fixture schema drift in $path: missing column(s) ${missing.mkString(", ")} " +
          s"(loaded: ${schema.simpleString}). The driver regenerated the fixture with a new " +
          s"layout — re-derive the reader from observation (see SURVEY.md §1.2 / FIXTURES.md) " +
          s"instead of patching call sites.")
      if (name == "events") {
        val t = schema("ts").dataType
        val ok = t == LongType || t == TimestampNTZType || t == TimestampType
        if (!ok)
          throw new IllegalStateException(
            s"Fixture schema drift in $path: events.ts loaded as ${t.simpleString}; Tables.events " +
            s"handles bigint (nanos-as-long), timestamp_ntz (µs/ms NTZ) and timestamp (µs/ms " +
            s"UTC-adjusted). The fixture's ts encoding changed — extend the branch in " +
            s"Tables.events and update SURVEY.md §1.2 + FIXTURES.md.")
      }
      // Two more crash-radius-~25-query typed columns: one clear error
      // beats dozens of identical analysis failures (the events lesson).
      if (name == "embeddings" && schema("embedding").dataType != ArrayType(FloatType, true) &&
          schema("embedding").dataType != ArrayType(FloatType, false))
        throw new IllegalStateException(
          s"Fixture schema drift in $path: embeddings.embedding loaded as " +
          s"${schema("embedding").dataType.simpleString}, expected array<float> — the similarity/" +
          s"ANN family's quantization (×10⁶ floor on FLOAT inputs) assumes float32 values; " +
          s"re-derive the readers and goldens from observation (FIXTURES.md).")
      if (name == "documents" && schema("text").dataType != StringType)
        throw new IllegalStateException(
          s"Fixture schema drift in $path: documents.text loaded as " +
          s"${schema("text").dataType.simpleString}, expected string — see FIXTURES.md.")
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      guardSchema(name, path, df.schema)
      schemaCache.putIfAbsent(path, df.schema)
      df
    }
  }

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   =
    withNtz(table(s, d, "orders"), "o_orderdate")
  def lineitem(s: SparkSession, d: String): DataFrame =
    withNtz(table(s, d, "lineitem"), "l_shipdate")

  /** Normalize a wall-clock timestamp column to TIMESTAMP_NTZ regardless of
    * its parquet encoding — the same drift-robustness class as
    * `withEventTime`, for the orders/lineitem date columns (currently
    * ms-NTZ, a pass-through; a regenerated UTC-adjusted or DATE encoding
    * would otherwise crash every date-consuming query the way events.ts
    * did in round 10→11). The LTZ branch converts timezone-independently
    * (unix_micros is epoch-exact; timestampadd against an NTZ epoch literal
    * re-renders the same instant as UTC wall-clock — verified invariant
    * under an America/New_York session incl. DST). Pass-through keeps the
    * loaded column untouched, so parquet filter pushdown on these columns
    * is unchanged for the current fixtures.
    */
  def withNtz(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.schema(c).dataType match {
        case TimestampNTZType => d
        case TimestampType => d.withColumn(c,
          expr(s"timestampadd(MICROSECOND, unix_micros($c), timestamp_ntz'1970-01-01 00:00:00')"))
        case DateType => d.withColumn(c, col(c).cast(TimestampNTZType))
        case other => throw new IllegalStateException(
          s"$c loaded as ${other.simpleString} — unsupported wall-clock encoding; the fixture " +
          s"changed (see SURVEY.md §1.2): extend Tables.withNtz and update FIXTURES.md.")
      }
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` ingestion — branches on the LOADED Spark type because the
    * driver has shipped this column under two encodings already (round ≤10:
    * INT64 TIMESTAMP(NANOS) which stock Spark rejects without
    * `nanosAsLong`; round 11+: INT64 TIMESTAMP(MICROS, adjustedToUTC=false)
    * which loads natively as timestamp_ntz — verified via pyarrow footers,
    * 2026-08-13). A real lake has µs, ms and ns parquet timestamps side by
    * side, so ONE hard-coded encoding is a correctness bug waiting for the
    * next regeneration; this is the single ingestion point for all ~36
    * events consumers, which only ever read the derived columns:
    *   - `ts_us`  : BIGINT microseconds since epoch (exact integer math), and
    *   - `ts_ntz` : TIMESTAMP_NTZ at microsecond precision.
    * All derivations are TIMEZONE-INDEPENDENT (timestampdiff/timestampadd
    * against a TIMESTAMP_NTZ epoch literal — verified to produce identical
    * values under an America/New_York session). Every entry point
    * (Verify, Bench, tests) additionally pins spark.sql.session.timeZone
    * to UTC, but correctness does not depend on that: the derivation
    * cannot shift values under ANY session TZ by construction.
    * DuckDB 1.0 reads the same column as naive
    * TIMESTAMP at µs precision either way, so every oracle comparison runs
    * in the µs domain with identical values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Kept for robustness against a NANOS-encoded fixture (a no-op for the
    // current MICROS encoding). Guard the set: SET on an already-true conf
    // still bumps session-state modification tracking on every one of the
    // ~40 events-reading queries.
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") != Some("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTime(table(s, d, "events"))
  }

  /** The ts_us/ts_ntz derivation, shared by the batch reader above and any
    * `readStream` over the same layout (StreamingSpec's file-source parity
    * test goes through this exact function, so the batch and stream paths
    * cannot drift). Works on batch AND streaming DataFrames — it only
    * inspects the analyzed schema and adds projections.
    */
  def withEventTime(raw: DataFrame): DataFrame = {
    val epochNtz = "timestamp_ntz'1970-01-01 00:00:00'"
    raw.schema("ts").dataType match {
      case TimestampNTZType => // current fixtures: parquet TIMESTAMP(MICROS, utc=false)
        raw.withColumn("ts_us", expr(s"timestampdiff(MICROSECOND, $epochNtz, ts)"))
          .withColumn("ts_ntz", col("ts"))
      case LongType => // historical fixtures: TIMESTAMP(NANOS) via nanosAsLong.
        // Integer `div`, never `/1000` — double division loses ULPs at 1.7e18 ns;
        // the µs truncation matches DuckDB's read of the same column.
        raw.withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts_ntz", expr(s"timestampadd(MICROSECOND, ts div 1000, $epochNtz)"))
      case TimestampType => // UTC-adjusted parquet (not yet seen from the driver)
        raw.withColumn("ts_us", expr("unix_micros(ts)"))
          .withColumn("ts_ntz", expr(s"timestampadd(MICROSECOND, unix_micros(ts), $epochNtz)"))
      case other =>
        throw new IllegalStateException(
          s"events.ts loaded as ${other.simpleString} — unsupported encoding; see Tables.guardSchema")
    }
  }
}
