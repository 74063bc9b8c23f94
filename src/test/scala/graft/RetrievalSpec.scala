package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hybrid-retrieval suite (queries/Retrieval.scala) at sf0.001 — semantic
  * gates on top of the driver's DuckDB hash-compare: the RRF fusion must
  * be exactly reconstructible from the two rank columns it carries, and
  * the retrieval_eval metrics must satisfy the ranking-metric identities
  * (DCG ≤ IDCG, NDCG ≤ 1, MRR = 1e6/first_rel) with the SAME integer
  * log₂ weights re-derived independently here.
  */
class RetrievalSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterEach {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  private def run(key: String) = SparkEntry.queries(key)(s, d)
  override def afterEach(): Unit = { s.catalog.clearCache(); super.afterEach() }

  test("retrieval_rrf: fused score reconstructs exactly from the rank columns") {
    val rows = run("retrieval_rrf").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (rLex, rDense, rrf) = (r.getInt(1), r.getInt(2), r.getLong(3))
      assert(rLex >= 0 && rLex <= 50 && rDense >= 0 && rDense <= 50)
      assert(rLex > 0 || rDense > 0, "every fused doc came from a candidate list")
      val expected =
        (if (rLex > 0) 1000000000L / (60 + rLex) else 0L) +
          (if (rDense > 0) 1000000000L / (60 + rDense) else 0L)
      assert(rrf == expected, s"doc ${r.getLong(0)}: rrf $rrf != $expected")
    }
    // descending fusion order with doc_id tie-break
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(3) > b.getLong(3) ||
          (a.getLong(3) == b.getLong(3) && a.getLong(0) < b.getLong(0)))
      case _ =>
    }
    // the fusion is genuinely hybrid on this fixture: at least one doc
    // ranked by both lists, and at least one contributed by a single list
    assert(rows.exists(r => r.getInt(1) > 0 && r.getInt(2) > 0))
    assert(rows.exists(r => r.getInt(1) == 0 || r.getInt(2) == 0))
  }

  test("retrieval_eval: metric identities hold with independent log2 weights") {
    val w = (1 to 10).map(i =>
      math.floor(1e9 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)
    val rows = run("retrieval_eval").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (nRel, firstRel) = (r.getInt(1), r.getInt(2))
      val (mrr, dcg, idcg, ndcg) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(nRel >= 0 && nRel <= 10)
      assert((nRel == 0) == (firstRel == 0), "first_rel set iff any hit")
      assert(mrr == (if (firstRel == 0) 0L else 1000000L / firstRel))
      assert(idcg == w.take(nRel).sum, "IDCG is the weight prefix sum")
      assert(dcg <= idcg, "DCG cannot beat the ideal ranking")
      // best case: the n_rel hits occupy the top ranks exactly
      if (nRel > 0) assert(dcg >= w.slice(10 - nRel, 10).sum,
        "DCG at least the worst-case (bottom-ranked hits) value")
      assert(ndcg == (if (nRel == 0) 0L else 1000000L * dcg / idcg))
      assert(ndcg <= 1000000L)
    }
    // fixture sanity: the labeled corpus gives the dense ranker signal —
    // some probe should land a same-label neighbor in its top 10
    assert(rows.exists(_.getInt(1) > 0), "at least one probe has a hit")
  }
}
