package graft

import java.time.LocalDateTime

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.11 stream-only rows (watermark / dedup / stateful) plus
  * batch↔stream parity, via MemoryStream micro-batches with controlled
  * event-time. LocalDateTime encodes as TIMESTAMP_NTZ, matching the batch
  * queries' `ts_ntz`.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def t(h: Int, m: Int): LocalDateTime = LocalDateTime.of(2024, 1, 1, h, m)

  test("stream_tumbling: streaming result equals the batch equivalent") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // replay the real sf0.001 events through a stream (driver collect is
    // test-only plumbing, never part of an operator)
    val rows = Tables.events(s, d)
      .select(col("ts_ntz"), col("event_type")).as[(LocalDateTime, String)]
      .collect().toSeq
    val ms = MemoryStream[(LocalDateTime, String)]
    val q = ms.toDF().toDF("ts_ntz", "event_type")
      .groupBy(window(col("ts_ntz"), "1 hour").as("w"), col("event_type"))
      .count()
      .writeStream.format("memory").queryName("tumbling_stream")
      .outputMode(OutputMode.Complete()).start()
    ms.addData(rows)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("tumbling_stream")
      .select(col("w.start").as("ws"), col("event_type"), col("count").as("cnt"))
    val batch = SparkEntry.queries("stream_tumbling")(s, d)
      .select("ws", "event_type", "cnt")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0L)
  }

  // watermarks require TIMESTAMP (LTZ) in Spark 4.1 — NTZ event time is
  // rejected (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); UTC session makes the
  // wall-clock values identical either way.
  private def ts(h: Int, m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(t(h, m))


  test("events_hourly_profile's aggregation streams: complete-mode result equals batch") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // the r9 Features-family profile aggregation is a plain combinable
    // groupBy over derived integer keys — exactly the shape Structured
    // Streaming runs incrementally; complete mode exposes the running
    // state, which must equal the batch answer after full replay
    val rows = Tables.events(s, d)
      .select(col("ts_us"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect().toSeq
    val ms = MemoryStream[(Long, String, Double)]
    val q = ms.toDF().toDF("ts_us", "event_type", "value")
      .select(col("event_type"),
        expr("cast((ts_us div 3600000000) % 24 as int)").as("hour_utc"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"))
      .groupBy("event_type", "hour_utc")
      .agg(count(lit(1)).as("n"),
        expr("cast(sum(vc) as double) / 100").as("v_sum"))
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode(OutputMode.Complete()).start()
    ms.addData(rows)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("hourly_stream")
    val batch = SparkEntry.queries("events_hourly_profile")(s, d)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0L &&
      batch.except(streamed).count() == 0L)
  }

  test("stream_watermark: a row later than the watermark is dropped") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, String)]
    val q = ms.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w")).count()
      .writeStream.format("memory").queryName("wm_stream")
      .outputMode(OutputMode.Append()).start()
    ms.addData(Seq((ts(10, 0), "a"), (ts(10, 10), "b")))
    q.processAllAvailable()
    ms.addData(Seq((ts(12, 30), "c"))) // watermark -> 11:30, closes [10:00,11:00)
    q.processAllAvailable()
    ms.addData(Seq((ts(10, 5), "late"))) // behind watermark: must be dropped
    q.processAllAvailable()
    ms.addData(Seq((ts(14, 0), "d"))) // close [12:00,13:00) too
    q.processAllAvailable()
    q.stop()
    val out = s.table("wm_stream")
      .select(col("w.start").as("ws"), col("count")).collect()
      .map(r => r.getAs[java.sql.Timestamp]("ws") -> r.getAs[Long]("count")).toMap
    assert(out(ts(10, 0)) == 2L, "late row must not be counted")
    assert(out(ts(12, 0)) == 1L)
  }

  test("stream_dedup: dropDuplicatesWithinWatermark emits each id once") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(java.sql.Timestamp, Long)]
    val q = ms.toDF().toDF("ts", "id")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    ms.addData(Seq((ts(10, 0), 1L), (ts(10, 1), 1L), (ts(10, 2), 2L)))
    q.processAllAvailable()
    ms.addData(Seq((ts(10, 30), 1L), (ts(10, 31), 3L))) // 1 still within watermark
    q.processAllAvailable()
    q.stop()
    val ids = s.table("dedup_stream").select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("file-source readStream: the batch tumbling query runs unchanged on a stream") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // stage the fixture as a streaming source directory
    val dir = Paths.get("target/tmp/stream_events")
    Files.createDirectories(dir)
    Files.copy(Paths.get(TestSpark.sf + "/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // raw file schema (no derived cols); the stream re-derives ts_us/ts_ntz
    // through the SAME Tables.withEventTime the batch reader uses.
    val schema = s.read.parquet(dir.toString).schema
    val stream = Tables.withEventTime(
      s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString))
      .groupBy(window(col("ts_ntz"), "1 hour").as("w"), col("event_type")).count()
    val q = stream.writeStream.format("memory").queryName("file_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("file_stream")
      .select(col("w.start").as("ws"), col("event_type"), col("count").as("cnt"))
    val batch = SparkEntry.queries("stream_tumbling")(s, d).select("ws", "event_type", "cnt")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0L)
  }

  test("Trigger.AvailableNow: a backfill drains the source and terminates itself") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // the production backfill pattern: process everything currently in the
    // source with streaming semantics (checkpointed, incremental, bounded
    // per-trigger) and EXIT — no manual stop(), no always-on cluster
    val dir = Paths.get("target/tmp/backfill_events")
    Files.createDirectories(dir)
    Files.copy(Paths.get(TestSpark.sf + "/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = s.read.parquet(dir.toString).schema
    val q = Tables.withEventTime(
        s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(dir.toString))
      .groupBy("event_type").count()
      .writeStream.format("memory").queryName("backfill_stream")
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // the trigger itself ends the query once the staged files are drained
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    val streamed = s.table("backfill_stream").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Tables.events(s, d).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("stream_stateful: per-key running count via flatMapGroupsWithState") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(String, Long)]
    val counter = (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) => {
      val total = state.getOption.getOrElse(0L) + rows.size
      state.update(total)
      Iterator.single((key, total))
    }
    val q = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(counter)
      .toDF("k", "running")
      .writeStream.format("memory").queryName("stateful_stream")
      .outputMode(OutputMode.Update()).start()
    ms.addData(Seq(("u1", 1L), ("u1", 2L), ("u2", 3L)))
    q.processAllAvailable()
    ms.addData(Seq(("u1", 4L)))
    q.processAllAvailable()
    q.stop()
    val last = s.table("stateful_stream").groupBy("k").agg(max("running").as("r"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last == Map("u1" -> 3L, "u2" -> 1L))
  }

  test("stream_stateful: transformWithState (Spark 4 state API) running count") {
    import s.implicits._
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, ValueState}
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    class Counter extends StatefulProcessor[String, (String, Long), (String, Long)] {
      @transient private var count: ValueState[Long] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        count = getHandle.getValueState[Long]("count",
          org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)
      override def handleInputRows(key: String, rows: Iterator[(String, Long)],
          timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Long)] = {
        val total = (if (count.exists()) count.get() else 0L) + rows.size
        count.update(total)
        Iterator.single((key, total))
      }
    }
    // transformWithState needs the RocksDB state store (multi-column-family)
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[(String, Long)]
    val q = ms.toDS()
      .groupByKey(_._1)
      .transformWithState(new Counter, TimeMode.None(), OutputMode.Update())
      .toDF("k", "running")
      .writeStream.format("memory").queryName("tws_stream")
      .outputMode(OutputMode.Update()).start()
    ms.addData(Seq(("u1", 1L), ("u1", 2L), ("u2", 3L)))
    q.processAllAvailable()
    ms.addData(Seq(("u1", 4L)))
    q.processAllAvailable()
    q.stop()
    s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    val last = s.table("tws_stream").groupBy("k").agg(max("running").as("r"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last == Map("u1" -> 3L, "u2" -> 1L))
  }

  /** sf0.001 events as (user_id, event_id, ts_us) in event-time order —
    * the replay feed for the incremental-SCD2 tests.
    */
  private def eventRows: Seq[(Long, Long, Long)] =
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._2)).toSeq

  /** Per-user SCD2 interval closer shared by the incremental-SCD2 tests:
    * state holds the OPEN interval; each arriving event closes it and
    * emits the finished (user, event_id, valid_from_us, valid_to_us) row.
    */
  private val scdCloser = (user: Long, es: Iterator[(Long, Long, Long)],
      state: GroupState[(Long, Long)]) => {
    // sort within the trigger: micro-batch iterator order is arrival
    // order, which a shuffle could permute
    val sorted = es.toSeq.sortBy(t => (t._3, t._2))
    val out = scala.collection.mutable.ListBuffer[(Long, Long, Long, Long)]()
    var open = state.getOption
    sorted.foreach { case (_, eid, ts) =>
      open.foreach { case (pid, pts) => out += ((user, pid, pts, ts)) }
      open = Some((eid, ts))
    }
    open.foreach(state.update)
    out.iterator
  }

  /** Batch scd_type2's CLOSED intervals (valid_to != null) in µs — the
    * oracle both incremental tests compare against.
    */
  private def closedIntervalsBatch: Set[(Long, Long, Long, Long)] = {
    def us(l: java.time.LocalDateTime): Long =
      l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + l.getNano / 1000L
    SparkEntry.queries("scd_type2")(s, d).collect()
      .filter(!_.isNullAt(4))
      .map(r => (r.getLong(0), r.getLong(1),
        us(r.getAs[java.time.LocalDateTime](3)), us(r.getAs[java.time.LocalDateTime](4))))
      .toSet
  }

  test("incremental SCD2: stateful stream closes the same intervals as batch scd_type2") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // the streaming twin of the batch lead() window. Replays the real
    // sf0.001 events split across two triggers (state must survive the
    // boundary).
    val rows = eventRows
    val closer = scdCloser
    val ms = MemoryStream[(Long, Long, Long)]
    val q = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(closer)
      .toDF("user_id", "event_id", "valid_from_us", "valid_to_us")
      .writeStream.format("memory").queryName("scd_stream")
      .outputMode(OutputMode.Update()).start()
    val (first, second) = rows.splitAt(rows.length / 2)
    ms.addData(first)
    q.processAllAvailable()
    ms.addData(second)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("scd_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch twin: every CLOSED interval of scd_type2 (valid_to != null)
    val batch = closedIntervalsBatch
    assert(streamed == batch)
    assert(batch.nonEmpty && streamed.size == 985) // 1000 events - 15 open intervals
  }

  test("exactly-once SCD2 sink: checkpoint recovery replays a batch idempotently") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // The exactly-once recipe a real pipeline runs: a checkpointed
    // stateful query + a foreachBatch sink that is IDEMPOTENT BY batchId
    // (a replayed micro-batch overwrites its own output, never appends).
    // The crash window Spark's contract leaves open is "offsets written,
    // commit marker not yet" — simulate it deterministically by deleting
    // the checkpoint's commits/0 after a clean stop: the restarted query
    // MUST re-execute batch 0 with the same batchId and the same data,
    // and per-user state recovered from the state store (version 0) must
    // reproduce byte-identical output, so the sink converges instead of
    // duplicating.
    val tmpBase = java.nio.file.Paths.get("target/tmp").toAbsolutePath
    java.nio.file.Files.createDirectories(tmpBase)
    val ckpt = java.nio.file.Files.createTempDirectory(tmpBase, "scd_ckpt")
    try {
    val sink = new java.util.concurrent.ConcurrentHashMap[
      java.lang.Long, Seq[(Long, Long, Long, Long)]]()
    val writeBatch: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (df, id) => {
        sink.put(id, df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq)
        ()
      }
    val ms = MemoryStream[(Long, Long, Long)]
    def start() = ms.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(scdCloser)
      .toDF("user_id", "event_id", "valid_from_us", "valid_to_us")
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .outputMode(OutputMode.Update())
      .foreachBatch(writeBatch)
      .start()
    val (first, second) = eventRows.splitAt(eventRows.length / 2)
    val q1 = start()
    ms.addData(first)
    q1.processAllAvailable()
    q1.stop()
    q1.awaitTermination() // fully release the checkpoint before restarting
    val rowsAfterRun1 = sink.values().stream().mapToInt(_.size).sum()
    assert(sink.containsKey(0L) && rowsAfterRun1 > 0)
    // crash simulation: batch 0 ran but its commit marker is lost (the
    // local ChecksumFileSystem's shadow .crc must go too, or the replay's
    // atomic rename sees a stale destination and reports a concurrent
    // writer)
    java.nio.file.Files.delete(ckpt.resolve("commits").resolve("0"))
    java.nio.file.Files.deleteIfExists(ckpt.resolve("commits").resolve(".0.crc"))
    ms.addData(second)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    // the replay reused batchId 0 (idempotence had something to absorb)
    // and batch 1 carried the rest — no third batch, no skipped id
    assert(sink.keySet().size() == 2 &&
      sink.containsKey(0L) && sink.containsKey(1L),
      s"unexpected batch ids: ${sink.keySet()}")
    // exactly-once end state: across the crash + replay the sink holds
    // every batch-twin interval exactly once (state survived the restart:
    // intervals spanning the trigger boundary close correctly)
    val all = sink.values().stream().toArray().toSeq
      .flatMap(_.asInstanceOf[Seq[(Long, Long, Long, Long)]])
    assert(all.size == all.toSet.size, "a replayed row was duplicated")
    assert(all.toSet == closedIntervalsBatch)
    assert(all.size == 985)
    } finally { // checkpoints accumulate state-store deltas — don't leak them
      java.nio.file.Files.walk(ckpt)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("stream-stream interval join: purchases x views within 1h, batch parity") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // both sides watermarked; the interval condition bounds the state each
    // side retains (Spark derives the retention window from it) — the
    // streaming analog of join_interval/attribution. Out-of-window and
    // wrong-user rows must not match.
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val v = views.toDF().toDF("v_user", "v_ts").withWatermark("v_ts", "1 hour")
    val p = purchases.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "1 hour")
    val joined = p.join(v,
      expr("p_user = v_user AND v_ts >= p_ts - interval 1 hour AND v_ts < p_ts"))
    val q = joined.writeStream.format("memory").queryName("ssj_stream")
      .outputMode(OutputMode.Append()).start()
    val vRows = Seq(
      (1L, ts(10, 0)),  // in window for u1 purchase @10:30
      (1L, ts(8, 0)),   // too old — outside 1h
      (2L, ts(10, 20)), // in window for u2 purchase @10:40
      (3L, ts(10, 25))) // wrong user for every purchase
    val pRows = Seq((1L, ts(10, 30)), (2L, ts(10, 40)))
    views.addData(vRows)
    purchases.addData(pRows)
    q.processAllAvailable()
    // advance both watermarks so pending state flushes
    views.addData(Seq((9L, ts(23, 0))))
    purchases.addData(Seq((9L, ts(23, 0))))
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("ssj_stream").select("p_user", "p_ts", "v_ts")
    // batch parity: the identical join expression over the same rows
    val batch = pRows.toDF("p_user", "p_ts").join(vRows.toDF("v_user", "v_ts"),
      expr("p_user = v_user AND v_ts >= p_ts - interval 1 hour AND v_ts < p_ts"))
      .select("p_user", "p_ts", "v_ts")
    assert(streamed.count() == 2L)
    assert(streamed.except(batch).count() == 0L &&
      batch.except(streamed).count() == 0L)
  }

  test("stream-stream LEFT OUTER join: null emission waits for the watermark") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // the subtle half of streaming joins: an unmatched left row CANNOT
    // emit when it arrives — a matching right row might still come — so
    // the null-padded result appears only once the watermark proves no
    // match can arrive. Both phases pinned: no premature null row, then
    // exactly the expected null row after the watermark passes.
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val v = views.toDF().toDF("v_user", "v_ts").withWatermark("v_ts", "1 hour")
    val p = purchases.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "1 hour")
    val joined = p.join(v,
      expr("p_user = v_user AND v_ts >= p_ts - interval 1 hour AND v_ts < p_ts"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssj_outer")
      .outputMode(OutputMode.Append()).start()
    views.addData(Seq((1L, ts(10, 0))))
    purchases.addData(Seq(
      (1L, ts(10, 30)),  // matched by the 10:00 view
      (4L, ts(10, 45)))) // no view at all — the outer case
    q.processAllAvailable()
    val phase1 = s.table("ssj_outer").collect()
    assert(!phase1.exists(_.isNullAt(3)),
      "unmatched row must NOT emit before the watermark closes its window")
    // advance both watermarks far past 10:45 + 1h so u4's state expires
    views.addData(Seq((9L, ts(23, 0))))
    purchases.addData(Seq((9L, ts(23, 0))))
    q.processAllAvailable()
    q.stop()
    val rows = s.table("ssj_outer")
      .select("p_user", "v_ts").collect()
    val matched = rows.filter(!_.isNullAt(1)).map(_.getLong(0)).toSet
    val nulls = rows.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    assert(matched == Set(1L), s"matched set wrong: $matched")
    // u4 emitted null-padded after expiry; u9 (the watermark-advance row)
    // also has no match and may expire within the run — only u4 is REQUIRED
    assert(nulls.contains(4L), s"expired unmatched row must emit: $nulls")
  }

  test("streaming parquet sink: partitioned lake landing with the exactly-once manifest") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = "/tmp/graft_stream_sink"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(base))
    val rows = Tables.documents(s, d)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val ms = MemoryStream[(Long, String, Long)]
    val q = ms.toDF().toDF("doc_id", "lang", "n_chars")
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$base/ckpt")
      .partitionBy("lang")
      .start(s"$base/out")
    // two micro-batches — the manifest must make their files ONE atomic
    // readable set, not torn directory listings
    val (a, b) = rows.partition(_._1 < 250)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    q.stop()
    // exactly-once contract of the file sink: readers trust the
    // _spark_metadata manifest, not the raw directory listing
    assert(new java.io.File(s"$base/out/_spark_metadata").exists(),
      "file-sink manifest missing")
    val back = s.read.parquet(s"$base/out")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(back == rows.toSet, s"landed ${back.size} of ${rows.size} rows")
    // hive-partitioned layout: one lang=<v> directory per language
    val langDirs = new java.io.File(s"$base/out").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang=")).map(_.getName).toSet
    assert(langDirs == rows.map(r => s"lang=${r._2}").toSet)
    rm(new java.io.File(base))
  }

  test("stream near-dup filter: banded-minhash candidates match batch, across batches") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // production band signatures (TextSim.gramTable + bandSignatures) over
    // the real docs PLUS two planted near-copies, so candidates exist even
    // if the fixture carries no organic band collision at this SF
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") < 2)
      .select((col("doc_id") + 9000L).as("doc_id"), col("text"))
    val bands = queries.TextSim.bandSignatures(
        queries.TextSim.gramTable(s, docs.unionByName(planted)))
      .select("doc_id", "bi", "bv1", "bv2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    s.catalog.clearCache() // retire the gram cache (test owns it here)

    // the online filter is the LIBRARY path since r14
    // (graft.streaming.NearDupFilter): state per band bucket = lowest
    // doc_id seen; a doc arriving into an owned bucket is a dup CANDIDATE
    // (exact re-rank happens downstream, same as the batch pipeline)
    val ms = MemoryStream[(Long, Int, Long, Long)]
    val q = graft.streaming.NearDupFilter.candidates(ms.toDS())
      .toDF("doc_id", "bi")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode(OutputMode.Update()).start()
    // two micro-batches split mid-corpus: a cross-batch collision (the
    // planted 9000/9001 ids arrive after their originals) must still be
    // caught by the persisted bucket state
    val (first, second) = bands.partition(_._1 < 250)
    ms.addData(first)
    q.processAllAvailable()
    ms.addData(second)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("neardup_stream").select("doc_id")
      .collect().map(_.getLong(0)).toSet

    // batch twin over the same signatures: every doc sharing a band bucket
    // with a lower doc_id
    val byBucket = bands.groupBy(r => (r._2, r._3, r._4))
    val batch = byBucket.values.flatMap { rs =>
      val lo = rs.map(_._1).min
      rs.map(_._1).filter(_ != lo)
    }.toSet
    assert(streamed == batch, s"stream=${streamed.size} batch=${batch.size}")
    // the planted copies MUST be flagged, and flagged across the batch cut
    assert(Set(9000L, 9001L).subsetOf(streamed))
  }

  test("warm-started near-dup stream flags dups of a persisted index in the first micro-batch") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // the cross-run warehouse shape, streaming twin of dedup_incremental:
    // prior runs = the doc_id % 5 <> 0 split, distilled to the per-bucket
    // owner index; THIS run streams the % 5 = 0 split plus a planted
    // near-copy of an INDEXED doc (9001 copies doc 1, which is index-side)
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") === 1)
      .select(lit(9001L).as("doc_id"), col("text"))
    // ONE signature job; the index/stream split happens driver-side
    val allBands = queries.TextSim.bandSignatures(
        queries.TextSim.gramTable(s, docs.unionByName(planted)))
      .select("doc_id", "bi", "bv1", "bv2")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    s.catalog.clearCache() // retire the gram cache (test owns it here)
    // raw per-doc index rows, NOT pre-aggregated to one owner per bucket:
    // candidatesWarmStarted must distill them itself (min per bucket)
    val idx = allBands.filter(r => r._1 % 5 != 0 && r._1 < 9000L)
      .map(r => ((r._2, r._3, r._4), r._1))
    val streamRows = allBands.filter(r => r._1 % 5 == 0 || r._1 == 9001L)

    val ms = MemoryStream[(Long, Int, Long, Long)]
    val q = graft.streaming.NearDupFilter
      .candidatesWarmStarted(ms.toDS(), s.createDataset(idx))
      .toDF("doc_id", "bi")
      .writeStream.format("memory").queryName("neardup_warm")
      .outputMode(OutputMode.Update()).start()
    // ONE micro-batch: collisions with prior runs must fire immediately,
    // without any old-corpus row ever entering the stream
    ms.addData(streamRows)
    q.processAllAvailable()
    q.stop()
    val streamed = s.table("neardup_warm").select("doc_id")
      .collect().map(_.getLong(0)).toSet

    // driver-side twin of the warm-started transition over the same rows
    // (min per bucket = the distillation candidatesWarmStarted applies)
    val ownerByBucket = idx.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val twin = streamRows.groupBy(r => (r._2, r._3, r._4)).flatMap { case (b, rs) =>
      val ids = rs.map(_._1).sorted
      var owner = ownerByBucket.get(b)
      val out = scala.collection.mutable.ListBuffer[Long]()
      ids.foreach { id =>
        owner match {
          case Some(o) if o < id => out += id
          case Some(o) if o > id => out += o; owner = Some(id)
          case None => owner = Some(id)
          case _ => ()
        }
      }
      out
    }.toSet
    assert(streamed == twin, s"stream=${streamed.size} twin=${twin.size}")
    assert(streamed.contains(9001L),
      "a near-copy of an indexed doc must be flagged in its first micro-batch")
  }

  test("RocksDB state store: stateful streaming runs on the production state backend, batch-exact") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // the default HDFS-backed in-memory provider holds every key's state
    // on the executor heap — a non-starter for corpus-scale streaming
    // state. Pin that the engine's stateful shapes run unchanged on the
    // spillable RocksDB provider (the production 100 TB backend): same
    // query, same results as batch, and the state operator really
    // reports RocksDB metrics (so a conf typo cannot silently fall back)
    val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rows = Tables.events(s, d)
        .select(col("ts_ntz"), col("event_type")).as[(LocalDateTime, String)]
        .collect().toSeq
      val ms = MemoryStream[(LocalDateTime, String)]
      val q = ms.toDF().toDF("ts_ntz", "event_type")
        .groupBy(window(col("ts_ntz"), "1 hour").as("w"), col("event_type"))
        .count()
        .writeStream.format("memory").queryName("rocksdb_stream")
        .outputMode(OutputMode.Complete()).start()
      try {
        val (a, b) = rows.partition(_._1.getHour < 12)
        ms.addData(a); q.processAllAvailable()
        ms.addData(b); q.processAllAvailable()
        val metrics = q.lastProgress.stateOperators.head.customMetrics.keySet()
        assert(metrics.toString.toLowerCase.contains("rocksdb"),
          s"state operator must report RocksDB metrics, got $metrics")
      } finally q.stop()
      val streamed = s.table("rocksdb_stream")
        .select(col("w.start").as("ws"), col("event_type"), col("count"))
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      val batch = Tables.events(s, d)
        .groupBy(window(col("ts_ntz"), "1 hour").as("w"), col("event_type"))
        .count()
        .select(col("w.start").as("ws"), col("event_type"), col("count"))
        .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch, s"RocksDB-backed result diverged from batch")
    } finally prev match {
      case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming IVF-PQ index append: frozen-codebook encode lands cell-partitioned, bit-equal to the trained index") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // the production index-maintenance path: the model is FROZEN (trained
    // once), new embeddings arrive as a stream, each micro-batch is
    // cell-routed + PQ-encoded statelessly and appended to the
    // cell-partitioned code table the search side scans. Gates: (1) the
    // streamed encode must reproduce the fit pipeline's OWN corpus
    // assignments bit-for-bit — IvfPqModel.encode is an independent
    // reimplementation of the training-side assignment, so any drift in
    // quantization/tie-breaks/index layout fails here; (2) the landed
    // layout must actually be cell-partitioned (the file-level skipping
    // ann_ivfpq's comment promises).
    val expected = queries.LlmOps.ivfPqCorpus(s, d).collect()
      .map(r => (r.getLong(0), (r.getInt(2), r.getSeq[Long](1).toSeq)))
      .toMap
    s.catalog.clearCache()
    val model = queries.LlmOps.ivfPqModel(s, d)
    val vecs = Tables.embeddings(s, d).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    TestSpark.withTempDir("graft_ivfpq_append") { base =>
      val ms = MemoryStream[(Long, Seq[Float])]
      val q = model.encode(ms.toDF().toDF("vec_id", "embedding"))
        .writeStream.format("parquet")
        .option("checkpointLocation", s"$base/ckpt")
        .partitionBy("cluster")
        .start(s"$base/out")
      try {
        val (a, b) = vecs.partition(_._1 % 2 == 0) // interleaved arrival order
        ms.addData(a); q.processAllAvailable()
        ms.addData(b); q.processAllAvailable()
      } finally q.stop() // a failed assert must not leave the query running
      // NO rename/cast below: the landed schema must BE the batch corpus
      // schema (cluster INT, codes ARRAY<BIGINT>)
      val landed = s.read.parquet(s"$base/out")
        .select("vec_id", "cluster", "codes").collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getSeq[Long](2).toSeq)))
        .toMap
      assert(landed.size == expected.size,
        s"landed ${landed.size} of ${expected.size} index rows")
      val diverged = expected.collect {
        case (id, e) if landed(id) != e => (id, e, landed(id)) }
      assert(diverged.isEmpty,
        s"streamed encode diverged from the trained index: ${diverged.take(3)}")
      // cell-partitioned landing: one cluster=<k> directory per occupied
      // cell, and a one-cell read returns exactly that cell's members
      val cellDirs = new java.io.File(s"$base/out").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cluster=")).map(_.getName).toSet
      assert(cellDirs == expected.values.map(v => s"cluster=${v._1}").toSet)
      val someCell = expected.values.head._1
      val members = s.read.parquet(s"$base/out/cluster=$someCell")
        .select("vec_id").as[Long].collect().toSet
      assert(members == expected.collect {
        case (id, (c, _)) if c == someCell => id }.toSet)
    }
  }

  test("streaming heavy-hitters: MG contract over the whole history, across micro-batches") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val k = 6
    // g1 is wider than the sketch (decrements fire) with a hitter that
    // only becomes heavy in batch 2; g2 is narrower than k → exact
    val b1: Seq[(String, String)] =
      Seq.fill(30)(("g1", "hot")) ++
        ('a' to 'j').flatMap(c => Seq.fill(2)(("g1", c.toString))) ++
        Seq.fill(10)(("g2", "x")) ++ Seq.fill(5)(("g2", "y")) ++ Seq(("g2", "z"))
    val b2: Seq[(String, String)] =
      Seq.fill(20)(("g1", "hot")) ++ Seq.fill(40)(("g1", "late")) ++
        Seq.fill(3)(("g1", "b"))
    val ms = MemoryStream[(String, String)]
    val q = graft.streaming.HeavyHitters.monitor(ms.toDS(), k)
      .toDF("group", "item", "est", "err", "n")
      .writeStream.format("memory").queryName("hh_stream")
      .outputMode(OutputMode.Update()).start()
    ms.addData(b1); q.processAllAvailable()
    ms.addData(b2); q.processAllAvailable()
    q.stop()
    val all = b1 ++ b2
    val truth = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val groupN = all.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    // the FINAL emission per group is the rows carrying the group's full
    // history count n (the memory sink accumulates every batch's rows)
    val fin = s.table("hh_stream")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .filter { case (g, _, _, _, n) => n == groupN(g) }
    assert(fin.map(_._1).toSet == Set("g1", "g2"))
    fin.groupBy(_._1).foreach { case (g, rows) =>
      val n = groupN(g)
      val err = rows.head._4
      assert(rows.forall(_._4 == err), s"$g: summary-level err must repeat")
      assert(rows.length <= k - 1 && err <= n / k, s"$g bounds")
      rows.foreach { case (_, item, est, _, _) =>
        val t = truth.getOrElse((g, item), 0L)
        assert(est <= t && t <= est + err, s"$g/$item est=$est true=$t err=$err")
      }
      val reported = rows.map(_._2).toSet
      truth.collect { case ((`g`, item), c) if c > n.toDouble / k => item }
        .foreach(hh => assert(reported.contains(hh), s"$g heavy hitter $hh missing"))
    }
    // cross-batch accumulation: "late" was absent in batch 1 yet is the
    // second-heaviest item overall and MUST be in the final g1 sketch
    assert(fin.exists(r => r._1 == "g1" && r._2 == "late"))
    // narrow group: sketch is EXACT (err 0, counts equal truth)
    val g2 = fin.filter(_._1 == "g2")
    assert(g2.forall(_._4 == 0L))
    assert(g2.map(r => r._2 -> r._3).toMap ==
      Map("x" -> 10L, "y" -> 5L, "z" -> 1L))
  }

  test("streaming heavy-hitters: sketch state survives a checkpointed restart") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val k = 5
    val b1: Seq[(String, String)] =
      Seq.fill(15)(("g", "hot")) ++ ('a' to 'f').map(c => ("g", c.toString))
    val b2: Seq[(String, String)] =
      Seq.fill(7)(("g", "warm")) ++ Seq.fill(3)(("g", "hot")) ++
        ('c' to 'h').map(c => ("g", c.toString))
    // JVM twin: the monitor folds each batch's items sorted, so the
    // expected post-restart state is derivable without Spark
    def expected(batches: Seq[Seq[(String, String)]]): Map[String, Long] = {
      val sk = new graft.functions.MGSummary(k)
      batches.foreach(_.map(_._2).sorted.foreach(sk.add))
      sk.counts.toMap
    }
    val tmpBase = java.nio.file.Paths.get("target/tmp").toAbsolutePath
    java.nio.file.Files.createDirectories(tmpBase)
    val ckpt = java.nio.file.Files.createTempDirectory(tmpBase, "hh_ckpt")
    try {
      val sink = new java.util.concurrent.ConcurrentHashMap[
        java.lang.Long, Seq[(String, String, Long, Long, Long)]]()
      val ms = MemoryStream[(String, String)]
      def start() = graft.streaming.HeavyHitters.monitor(ms.toDS(), k)
        .toDF("group", "item", "est", "err", "n")
        .writeStream.option("checkpointLocation", ckpt.toString)
        .outputMode(OutputMode.Update())
        .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          sink.put(id, df.collect().map(r => (r.getString(0), r.getString(1),
            r.getLong(2), r.getLong(3), r.getLong(4))).toSeq)
          ()
        }.start()
      val q1 = start()
      ms.addData(b1)
      q1.processAllAvailable()
      q1.stop(); q1.awaitTermination()
      assert(sink.get(0L).map(r => r._2 -> r._3).toMap == expected(Seq(b1)))
      // restart from the checkpoint in a NEW query — keyed sketch state
      // must come back from the state store, not from replaying batch 1
      val q2 = start()
      ms.addData(b2)
      q2.processAllAvailable()
      q2.stop(); q2.awaitTermination()
      val finalBatch = sink.keySet().stream().mapToLong(_.longValue).max.getAsLong
      val got = sink.get(finalBatch)
      assert(got.map(r => r._2 -> r._3).toMap == expected(Seq(b1, b2)),
        s"post-restart sketch diverged: $got")
      assert(got.forall(_._5 == (b1.length + b2.length).toLong),
        "history count must include the pre-restart batch")
    } finally {
      java.nio.file.Files.walk(ckpt)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("streaming heavy-hitters warm start: seeded run equals cold continuation bit-exactly") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val k = 5
    val b1: Seq[(String, String)] =
      Seq.fill(12)(("g", "p")) ++ ('a' to 'h').map(c => ("g", c.toString))
    val b2: Seq[(String, String)] =
      Seq.fill(9)(("g", "q")) ++ Seq.fill(4)(("g", "p")) ++
        ('d' to 'i').map(c => ("g", c.toString))
    def runStream(batches: Seq[Seq[(String, String)]], name: String,
        seed: Option[Seq[(String, String, Long, Long, Long)]]) = {
      val ms = MemoryStream[(String, String)]
      val src = ms.toDS()
      val mon = seed match {
        case None => graft.streaming.HeavyHitters.monitor(src, k)
        case Some(rows) => graft.streaming.HeavyHitters.monitorWarmStarted(
          src, k, graft.streaming.HeavyHitters.stateFromRows(rows.toDS(), k))
      }
      val q = mon.toDF("group", "item", "est", "err", "n")
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      batches.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
      s.table(name).collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    }
    val cold = runStream(Seq(b1, b2), "hh_cold", None)
    val coldFinal = cold.filter(_._5 == (b1.length + b2.length).toLong).toSet
    // seed a fresh run from the batch-1 emission (ONE emission = the
    // full sketch state), then stream only batch 2
    val emission1 = runStream(Seq(b1), "hh_seed_src", None).toSeq
    assert(emission1.forall(_._5 == b1.length.toLong))
    val warm = runStream(Seq(b2), "hh_warm", Some(emission1))
    assert(warm.map(_._5).max == (b1.length + b2.length).toLong,
      "warm run must carry the seeded history count forward")
    assert(warm.filter(_._5 == (b1.length + b2.length).toLong).toSet == coldFinal,
      s"warm=${warm.toSeq.sorted} cold=${coldFinal.toSeq.sorted}")
    // accumulating-sink robustness (r14 ADVICE): feeding stateFromRows
    // ALL emissions (an Update-mode memory sink keeps every batch's
    // rows) must rebuild from the LATEST emission only — a max-over-
    // batches merge could exceed the final counter and break est <= true
    val allEmissions = runStream(Seq(b1, b2), "hh_all_src", None).toSeq
    assert(allEmissions.map(_._5).distinct.size > 1,
      "fixture must contain more than one emission for this gate")
    val warmAll = runStream(Seq(), "hh_warm_all", Some(allEmissions))
    val latest = allEmissions.filter(_._5 == (b1.length + b2.length).toLong).toSet
    // no batches streamed: re-emitting nothing — verify by seeding a
    // third run with a probe batch and checking est <= true continuation
    val probe: Seq[(String, String)] = Seq(("g", "p"))
    val cont = runStream(Seq(probe), "hh_cont",
      Some(allEmissions)).filter(_._5 == (b1.length + b2.length + 1).toLong)
    val contP = cont.find(_._2 == "p").map(_._3).getOrElse(0L)
    val latestP = latest.find(_._2 == "p").map(_._3).getOrElse(0L)
    assert(contP == latestP + 1,
      s"state must rebuild from the latest emission only: got $contP, " +
        s"latest counter $latestP (a stale-emission merge would inflate it)")
    assert(warmAll.isEmpty, "no input batches -> no emissions")
  }
}
