package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability via `Dataset.observe`: data-quality counters ride
  * the SAME pass as the job (CollectMetrics is a map-side accumulator-style
  * aggregate) — at 100 TB that is one corpus scan saved versus running the
  * QA aggregation separately, and the numbers describe EXACTLY the rows the
  * job processed, not a re-scan that may race a concurrent write.
  */
class ObservabilitySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  test("observe(): QA counters collected in the same pass match direct aggregates") {
    val obs = Observation("corpus_qa")
    val docs = Tables.documents(s, d)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(expr("CASE WHEN n_chars < 50 THEN 1 ELSE 0 END")).as("n_short"),
        // DISTINCT aggregates are rejected by CollectMetrics (they cannot
        // merge accumulator-style) — the mergeable HLL sketch is the
        // documented substitute, and the direct twin uses the same sketch
        approx_count_distinct(col("lang")).as("n_langs"),
        max(col("n_chars")).as("max_chars"))
    // the job: plain downstream work; metrics piggyback on ITS execution
    val kept = docs.filter(col("n_chars") >= 50).count()
    val m = obs.get
    val direct = Tables.documents(s, d).agg(
        count(lit(1)), sum(expr("CASE WHEN n_chars < 50 THEN 1 ELSE 0 END")),
        approx_count_distinct(col("lang")), max(col("n_chars")))
      .collect().head
    assert(m("n_rows") == direct.getLong(0))
    assert(m("n_short") == direct.getLong(1))
    assert(m("n_langs") == direct.getLong(2))
    assert(m("max_chars") == direct.getLong(3))
    // the metrics describe the observed (pre-filter) pass, and reconcile
    // with the job's own output
    assert(kept == m("n_rows").asInstanceOf[Long] - m("n_short").asInstanceOf[Long])
  }

  test("observe() on a streaming query: per-batch metrics via the progress events") {
    import s.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = ms.toDF().toDF("id", "n_chars")
      .observe("batch_qa", count(lit(1)).as("n"),
        sum(expr("CASE WHEN n_chars < 50 THEN 1 ELSE 0 END")).as("short"))
      .writeStream.format("memory").queryName("obs_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    ms.addData(Seq((1L, 10L), (2L, 100L), (3L, 20L)))
    q.processAllAvailable()
    val prog = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("batch_qa"))).lastOption
    q.stop()
    assert(prog.isDefined, "no observed metrics in streaming progress")
    assert(prog.get.getAs[Long]("n") == 3L && prog.get.getAs[Long]("short") == 2L)
  }
}
