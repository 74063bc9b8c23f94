package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** Two-sided per-key SHUFFLE-RECORD gate — the data-VOLUME twin of
  * PlansSpec's parquet-scan gate and JobsSpec's job-count gate. Shuffle
  * write records are what a re-plan can silently grow without touching
  * either sibling metric: a lost partial aggregate, a join that stopped
  * broadcasting, a window that lost its pre-collapse all change what
  * crosses the wire — and at 100 TB the wire IS the cost — while scan
  * and job counts stay put. Records, not bytes: bytes wobble with codec
  * framing; record counts are exact for a deterministic plan at a fixed
  * shuffle-partition config (verified: two independent JVMs produced
  * identical counts for all thirty keys below).
  *
  * Keys = the top-30 by total shuffle write at the suite config (the
  * volume-exposure set, audited 2026-08-16 via tools/shufflecount.scala
  * at sf0.001, local[4], shuffle.partitions=4). The magnitudes are the
  * scale story in miniature: the dedup family's ~81k-record build is
  * its shingle-explode signature index (linear in grams, combinable),
  * span/verbatim's ~50-95k run records are gram-level rows, and nothing
  * is quadratic. Fails BOTH ways: an increase is a volume regression, a
  * decrease is a stale baseline — re-audit and record the improvement.
  *
  * Counting protocol (tools/shufflecount.scala, frozen): warm every key
  * once (codegen, SessionMemo model fits), then per key: clearCache,
  * count records written while the DataFrame is CONSTRUCTED (pinOnce
  * materializations, model fits, boundary collects) and while it runs
  * once through a noop sink. Listener events are async — counts are
  * read only after two 50 ms polls agree.
  */
class ShuffleSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  /** (build, run) shuffle-write-record baseline, audited 2026-08-16
    * (r18) at the suite config.
    */
  private val expected: Map[String, (Long, Long)] = Map(
    // r20 new-key audit (tools/shufflecount at the suite config): the
    // re-rank's run records are the ADC candidate rows entering the two
    // bounded windows (shortlist + final top-3) — 1.5x ann_ivfpq's 800,
    // never corpus-sized
    "ann_ivfpq_rerank" -> (0L, 1200L),
    "ann_lsh_bucket" -> (0L, 10496L),
    "chunk_overlap" -> (0L, 6672L),
    "corpus_heaps" -> (1L, 16555L),
    "corpus_novelty" -> (0L, 10920L),
    "dedup_calibration" -> (29403L, 108L),
    "dedup_chunk" -> (0L, 9426L),
    // r22: the CC edge count rides the pair-frame materialization
    // (jaccardPairsCounted -> graphSizeHint), so its 4 partial-count
    // shuffle records are gone from the build phase: 81221 -> 81217
    "dedup_cluster" -> (81217L, 1000L),
    "dedup_containment" -> (81213L, 8L),
    "dedup_fuzzy" -> (27407L, 9568L),
    "dedup_incremental" -> (27407L, 4523L),
    "dedup_ngram_jaccard" -> (81217L, 8L),
    "dedup_rate_by_source" -> (81217L, 56L),
    "dedup_retention" -> (81217L, 1000L), // r22: same cut as dedup_cluster
    "dedup_strip" -> (1L, 10915L),
    "fn_explode" -> (0L, 32000L),
    "graph_degree" -> (81217L, 516L),
    "inverted_index" -> (0L, 11743L),
    "join_sortmerge" -> (0L, 13500L),
    "knn_label_ann" -> (0L, 18397L),
    "mm_frame_sample" -> (0L, 12686L),
    "outlier_mad" -> (0L, 12003L),
    // r19 re-audit: unpinned single-pass form — all shuffle moves to the
    // run phase; total 14884 -> 15043 (the nc subtree re-shuffles cp, the
    // two deleted full-frame window shuffles pay for it)
    "sim_sparse_cosine" -> (0L, 15043L),
    "span_attribution" -> (504L, 95278L),
    "stats_spearman" -> (0L, 12003L),
    "text_bigram_logprob" -> (0L, 9964L),
    "text_keyword_extract" -> (0L, 26491L),
    "text_ngram_coverage" -> (16510L, 404L),
    "text_tfidf" -> (0L, 11903L),
    "text_verbatim_spans" -> (504L, 50038L),
    "token_vocab" -> (0L, 11898L))

  test("per-key shuffle write records match the audited baseline (top volume keys)") {
    val keys = expected.keys.toSeq.sorted
    keys.foreach(k => assert(SparkEntry.queries.contains(k), s"unknown key $k"))
    val written = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          written.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    // ADVICE r18: one 50 ms agreement can mistake a listener-bus stall
    // (GC pause, slow dispatch) for a drained bus and leak build-phase
    // records into the run count; require TWO consecutive 200 ms
    // agreements before trusting the reading
    def settled(): Long = {
      var agree = 0
      var prev = -1L
      var cur = written.get()
      while (agree < 2) {
        Thread.sleep(200)
        prev = cur; cur = written.get()
        agree = if (cur == prev) agree + 1 else 0
      }
      cur
    }
    def sink(k: String): Unit = SparkEntry.queries(k)(s, d)
      .write.format("noop").mode("overwrite").save()
    s.sparkContext.addSparkListener(listener)
    try {
      keys.foreach { k => sink(k); s.catalog.clearCache() }
      val rows = keys.map { k =>
        s.catalog.clearCache()
        val w0 = settled()
        val df = SparkEntry.queries(k)(s, d)
        val wBuild = settled() - w0
        df.write.format("noop").mode("overwrite").save()
        val wRun = settled() - w0 - wBuild
        k -> (wBuild, wRun)
      }
      val drift = rows.filter { case (k, got) => got != expected(k) }
        .map { case (k, (b, r)) =>
          val (eb, er) = expected(k)
          s"$k: build $eb->$b run $er->$r"
        }
      assert(drift.isEmpty,
        "shuffle-record drift vs audited baseline (more = volume regression," +
          s" fewer = stale baseline; re-audit):\n${drift.mkString("\n")}")
    } finally s.sparkContext.removeSparkListener(listener)
  }
}
