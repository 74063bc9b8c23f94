package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-ingestion hardening: the first-touch schema guard must turn
  * driver-side fixture regeneration (the round-10/11 events.ts encoding
  * change) into ONE actionable error, and the events time derivation must
  * produce identical values under every encoding branch.
  */
class TablesSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private def stage(dir: String)(write: String => Unit): String = {
    val d = s"target/tmp/tables_guard/$dir"
    write(d)
    d
  }

  test("guard: a re-encoded events.ts fails fast with an actionable message") {
    val d = stage("bad_ts_type") { d =>
      // ts as plain string — an encoding Tables.events does not support
      Seq((1L, "2024-01-01 00:00:00", 7L, "click", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val e = intercept[IllegalStateException](Tables.events(s, d))
    assert(e.getMessage.contains("events.ts"), e.getMessage)
    assert(e.getMessage.contains("encoding changed"), e.getMessage)
  }

  test("guard: a dropped fixture column fails fast naming the column") {
    val d = stage("missing_col") { d =>
      Seq((1L, "x")).toDF("doc_id", "text") // lang/source/n_chars dropped
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    }
    val e = intercept[IllegalStateException](Tables.documents(s, d))
    assert(e.getMessage.contains("missing column"), e.getMessage)
    assert(e.getMessage.contains("lang"), e.getMessage)
  }

  test("guard: a re-typed embedding column fails fast with the quantization rationale") {
    val d = stage("bad_embedding") { d =>
      Seq((1L, Seq(0.1, 0.2), 3)).toDF("vec_id", "embedding", "label") // array<double>
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    }
    val e = intercept[IllegalStateException](Tables.embeddings(s, d))
    assert(e.getMessage.contains("embeddings.embedding"), e.getMessage)
    assert(e.getMessage.contains("array<float>"), e.getMessage)
  }

  test("withNtz: NTZ passes through untouched; LTZ and DATE re-render as UTC wall-clock") {
    val ntz = s.sql("SELECT timestamp_ntz'2024-07-15 12:34:56.789' AS d")
    assert(Tables.withNtz(ntz, "d").schema("d").dataType.simpleString == "timestamp_ntz")
    assert(Tables.withNtz(ntz, "d").queryExecution.analyzed == ntz.queryExecution.analyzed,
      "pass-through must not rewrite the plan (pushdown preservation)")
    // LTZ: the instant 2024-07-15 12:34:56 UTC must render as that UTC
    // wall-clock, independent of session tz (epoch-exact conversion)
    val ltz = s.sql("SELECT timestamp'2024-07-15 12:34:56' AS d") // UTC session
    val got = Tables.withNtz(ltz, "d").selectExpr("cast(d as string)").head.getString(0)
    assert(got == "2024-07-15 12:34:56", got)
    val dt = s.sql("SELECT date'2024-07-15' AS d")
    assert(Tables.withNtz(dt, "d").selectExpr("cast(d as string)").head.getString(0)
      == "2024-07-15 00:00:00")
    val bad = s.sql("SELECT 'x' AS d")
    val e = intercept[IllegalStateException](Tables.withNtz(bad, "d"))
    assert(e.getMessage.contains("unsupported wall-clock encoding"), e.getMessage)
  }

  test("withEventTime: NTZ and nanos-long encodings derive identical ts_us/ts_ntz") {
    // the same instants expressed in both historical fixture encodings
    val us = Seq(1704067798778549L, 1721044800000000L, 0L, -1000001L)
    val ntz = us.toDF("us")
      .selectExpr("timestampadd(MICROSECOND, us, timestamp_ntz'1970-01-01 00:00:00') as ts")
    val nanos = us.map(_ * 1000L).toDF("ts") // LongType nanos, as under nanosAsLong
    val a = Tables.withEventTime(ntz).select("ts_us", "ts_ntz").collect()
    val b = Tables.withEventTime(nanos).select("ts_us", "ts_ntz").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.getLong(0)).toSeq == us)
  }

  test("parquet schema evolution: mergeSchema unions batches; pruning survives the merge") {
    // a 100 TB lake accretes columns over time — old files lack the new
    // field; the reader contract is: mergeSchema unions the footers, old
    // rows surface NULL for the new column, and filter pushdown still
    // reaches the scan for columns present in all batches
    val s2 = TestSpark.spark
    import s2.implicits._
    TestSpark.withTempDir("graft_evolve") { dir =>
    Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
      .write.mode("append").parquet(dir)
    Seq((3L, "en", 0.9), (4L, "fr", 0.2)).toDF("doc_id", "lang", "quality")
      .write.mode("append").parquet(dir)
    val merged = s2.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "lang", "quality"))
    val rows = merged.orderBy("doc_id").collect()
    assert(rows.length == 4)
    assert(rows.take(2).forall(_.isNullAt(2)), "pre-evolution rows read NULL")
    assert(rows(2).getDouble(2) == 0.9)
    // DEFAULT read (no mergeSchema): schema comes from a sampled footer —
    // which footer wins is nondeterministic, so production readers on an
    // evolving table must pass mergeSchema or a explicit schema; we only
    // pin that the merged read prunes filters as usual
    val plan = merged.filter($"lang" === "en")
      .queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*lang".r.findFirstIn(plan).isDefined,
      s"lang filter must stay pushed on the merged scan:\n$plan")
    }
  }

  test("ignoreCorruptFiles salvages a scan past a truncated parquet part") {
    // fleet reality at 100 TB: a writer dies mid-file and the footer never
    // lands. Default semantics must FAIL the scan (silent data loss is
    // worse); the recovery knob must read every healthy file and skip the
    // torn one — both pinned
    val s2 = TestSpark.spark
    import s2.implicits._
    TestSpark.withTempDir("graft_corrupt") { dir =>
    Seq(1L, 2L, 3L).toDF("id").coalesce(1).write.parquet(s"$dir/good")
    // move the good file in, then plant a torn file beside it
    val target = new java.io.File(dir)
    new java.io.File(s"$dir/good").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => java.nio.file.Files.move(f.toPath,
        new java.io.File(target, f.getName).toPath))
    java.nio.file.Files.write(
      new java.io.File(target, "part-torn.snappy.parquet").toPath,
      "PAR1this-is-not-a-footer".getBytes)
    val ex = intercept[org.apache.spark.SparkException] {
      s2.read.schema("id LONG").parquet(dir).collect()
    }
    assert(ex.getMessage.contains("FAILED_READ_FILE") ||
      ex.getCause != null, s"default read must fail loudly: ${ex.getMessage}")
    val salvaged = s2.read.schema("id LONG")
      .option("ignoreCorruptFiles", "true").parquet(dir)
      .as[Long].collect().toSet
    assert(salvaged == Set(1L, 2L, 3L),
      s"healthy files must survive the salvage read: $salvaged")
    }
  }

  test("file discovery knobs: pathGlobFilter selects files, recursiveFileLookup flattens nesting") {
    // partial-lake reads without a table format: pathGlobFilter limits the
    // scan to matching file names (e.g. one export batch), and
    // recursiveFileLookup reads nested non-partition layouts (it DISABLES
    // partition inference — pinned, because silently losing partition
    // columns is the trap)
    val s2 = TestSpark.spark
    import s2.implicits._
    TestSpark.withTempDir("graft_disc") { base =>
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$base/nested/batch_001")
    Seq((2L, "b")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$base/nested/batch_002")
    val all = s2.read.option("recursiveFileLookup", "true").parquet(s"$base/nested")
    assert(all.count() == 2, "recursive lookup must find both nested batches")
    assert(all.columns.toSet == Set("id", "v"),
      "recursive lookup reads files only — no inferred partition columns")
    // glob-filtered read: only batch_001's files
    val one = s2.read
      .option("recursiveFileLookup", "true")
      .parquet(s"$base/nested/batch_001")
    assert(one.select("id").as[Long].collect().toSeq == Seq(1L))
    val globbed = s2.read
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$base/nested")
    assert(globbed.count() == 2, "glob on *.parquet keeps every data file")
    }
  }

  test("text ingest malformed-row policies: PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    // the 100 TB ingestion reality the clean staged sidecars never
    // exercise: raw crawls carry broken lines, and the pipeline's policy
    // knob decides between quarantine (PERMISSIVE + _corrupt_record),
    // silent drop, and hard stop — pin all three behaviors so an option
    // change in an ingest reader is a test failure, not a silent policy
    // switch
    val s2 = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv").toFile
    try {
      val f = new java.io.File(dir, "part.csv")
      java.nio.file.Files.writeString(f.toPath,
        "doc_id,n_chars\n1,10\nnot_a_number,20\n3,garbage\n4,40\n")
      val schema = "doc_id LONG, n_chars LONG, _corrupt_record STRING"
      def read(mode: String) = s2.read
        .option("header", "true").option("mode", mode)
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema).csv(f.getPath)
      // PERMISSIVE: every row survives; broken cells null out and the RAW
      // line is quarantined in _corrupt_record for a replay/repair pass
      val p = read("PERMISSIVE").collect()
      assert(p.length == 4)
      val corrupt = p.filter(!_.isNullAt(2))
      assert(corrupt.map(_.getString(2)).toSet ==
        Set("not_a_number,20", "3,garbage"))
      assert(p.filter(_.isNullAt(2)).map(_.getLong(0)).toSet == Set(1L, 4L))
      // DROPMALFORMED: only clean rows remain (the quarantine column must
      // not be in the requested schema or Spark keeps the bad rows)
      val d2 = s2.read.option("header", "true").option("mode", "DROPMALFORMED")
        .schema("doc_id LONG, n_chars LONG").csv(f.getPath).collect()
      assert(d2.map(_.getLong(0)).toSet == Set(1L, 4L))
      // FAILFAST: the first malformed row aborts the scan
      val ex = intercept[org.apache.spark.SparkException] {
        s2.read.option("header", "true").option("mode", "FAILFAST")
          .schema("doc_id LONG, n_chars LONG").csv(f.getPath).collect()
      }
      assert(ex.getMessage.contains("Malformed") ||
        ex.getCause != null, s"unexpected failure shape: ${ex.getMessage}")
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
