package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic + plan-shape gates for the round-12 corpus-preparation suite
  * (queries/Corpus.scala) and the nearest as-of join. Each oracled key also
  * runs through the DuckDB hash-compare; these tests pin the properties the
  * hash can't see — plan shape, brute-force equivalence on sf0.001, and
  * tie determinism on crafted data.
  */
class CorpusSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  // the shared aligned-6-token chunking, reimplemented independently
  private def chunks6(text: String): Seq[String] =
    text.split(" ", -1).toSeq.grouped(6).map(_.mkString(" ")).toSeq

  test("chunk_overlap: windows tile each doc with stride 4 and cover every token") {
    val rows = SparkEntry.queries("chunk_overlap")(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val w = docs(id).split(" ", -1).toSeq
      val sorted = cs.sortBy(_._2)
      // starts are 1, 5, 9, ... and the set of full windows covers the doc
      sorted.zipWithIndex.foreach { case ((_, idx, start, nTok, chunk), i) =>
        assert(idx == i + 1 && start == 4L * i + 1)
        val expect = w.slice(start.toInt - 1, start.toInt - 1 + 8)
        assert(chunk == expect.mkString(" ") && nTok == expect.length)
      }
      // last window reaches the final token (or the doc is shorter than 8)
      val (_, _, lastStart, lastN, _) = sorted.last
      assert(lastStart + lastN - 1 >= w.length - 3 && lastStart + lastN - 1 <= w.length)
    }
  }

  test("chunk_overlap and dataset_split are map-only (no hash exchange before the sort)") {
    for (k <- Seq("chunk_overlap", "dataset_split")) {
      val plan = SparkEntry.queries(k)(s, d).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"$k should not shuffle on a key:\n$plan")
    }
  }

  test("dataset_split: deterministic 80/10/10 hash assignment, stable across runs") {
    val a = SparkEntry.queries("dataset_split")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    val b = SparkEntry.queries("dataset_split")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getString(4)))
    assert(a.toSeq == b.toSeq, "split assignment must be run-stable")
    a.foreach { case (id, bucket, split) =>
      assert(bucket == (id * 2654435761L) % 1000)
      val expect = if (bucket < 800) "train" else if (bucket < 900) "val" else "test"
      assert(split == expect)
    }
    val frac = a.groupBy(_._3).view.mapValues(_.length.toDouble / a.length).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, s"train frac ${frac("train")}")
    assert(frac.getOrElse("val", 0.0) > 0.03 && frac.getOrElse("test", 0.0) > 0.03)
  }

  test("dedup_strip equals the brute-force strip of >=2-doc chunks") {
    val got = SparkEntry.queries("dedup_strip")(s, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val df = docs.flatMap { case (id, t) => chunks6(t).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.length).toMap
    val expect = docs.map { case (id, t) =>
      val cs = chunks6(t)
      val kept = cs.filter(c => df(c) < 2)
      (id, kept.mkString(" "), kept.length.toLong, (cs.length - kept.length).toLong)
    }
    assert(got.toSeq == expect.toSeq)
    // the operator must actually remove something at this SF
    assert(got.map(_._4).sum > 0, "no duplicated chunks stripped — fixture drift?")
  }

  test("source_overlap equals brute-force set intersection per source pair") {
    val got = SparkEntry.queries("source_overlap")(s, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    val bySrc = Tables.documents(s, d).select("source", "text").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.flatMap(r => chunks6(r.getString(1))).toSet).toMap
    val expect = (for {
      a <- bySrc.keys; b <- bySrc.keys if a < b
      c = (bySrc(a) & bySrc(b)).size if c > 0
    } yield (a, b) -> (c.toLong, bySrc(a).size.toLong, bySrc(b).size.toLong,
      c.toDouble / math.min(bySrc(a).size, bySrc(b).size))).toMap
    assert(got == expect)
    assert(got.nonEmpty, "no cross-source overlap at sf0.001 — fixture drift?")
  }

  test("corpus_novelty equals the brute-force first-owner computation") {
    val got = SparkEntry.queries("corpus_novelty")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val firstOwner = scala.collection.mutable.Map[String, Long]()
    docs.foreach { case (id, t) =>
      chunks6(t).distinct.foreach(c =>
        if (!firstOwner.contains(c) || firstOwner(c) > id) firstOwner(c) = id)
    }
    val expect = docs.map { case (id, t) =>
      val cs = chunks6(t).distinct
      (id, cs.length.toLong, cs.count(c => firstOwner(c) == id).toLong)
    }
    assert(got == expect.toSeq)
    // saturation must be visible: some doc repeats an earlier doc's chunk
    assert(got.exists { case (_, n, nov) => nov < n })
  }

  test("join_asof_nearest picks the closer neighbor, ties toward earlier") {
    val rows = SparkEntry.queries("join_asof_nearest")(s, d).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    val ev = Tables.events(s, d).select("event_id", "user_id", "ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = ev.groupBy(_._2)
    val expect = ev.sortBy(_._1).map { case (id, u, ts) =>
      val others = byUser(u).filter(_._3 != ts)
      if (others.isEmpty) (id, None, None)
      else {
        val best = others.minBy { case (oid, _, ots) =>
          (math.abs(ots - ts), if (ots < ts) 0 else 1, oid) }
        (id, Some(best._1), Some(math.abs(best._3 - ts)))
      }
    }
    assert(rows.sortBy(_._1).toSeq == expect.toSeq)
  }

  test("AsofJoin.nearest: duplicate (key, ts) ties resolve by the tie column") {
    import s.implicits._
    // left probe at ts=10; right rows at ts=8 (two copies, ids 1,2) and
    // ts=12 (two copies, ids 3,4): backward dt=2 == forward dt=2 -> the
    // EARLIER side wins, and among the equal-ts backward rows the
    // GREATEST tie (id=2) is kept; forward-only probe at ts=0 must take
    // the LEAST tie (id=1) of the equal-ts rows at 8.
    val left = Seq((100L, 1L, 10L), (101L, 1L, 0L)).toDF("pid", "k", "t")
    val right = Seq((1L, 1L, 8L), (2L, 1L, 8L), (3L, 1L, 12L), (4L, 1L, 12L))
      .toDF("rid", "k", "t")
    val out = operators.AsofJoin.nearest(left, right, key = "k", ts = "t",
      payload = Seq("rid"), rightTie = "rid")
      .select("pid", "near_rid", "near_dt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(out == Seq((100L, 2L, 2L), (101L, 1L, 8L)))
  }

  test("join_asof_nearest plans ONE hash exchange for both window passes") {
    val plan = SparkEntry.queries("join_asof_nearest")(s, d)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(n == 1, s"expected one user_id exchange, got $n:\n$plan")
  }

  test("dedup_strip plans an anti join on the chunk, never a broadcast nested loop") {
    val plan = SparkEntry.queries("dedup_strip")(s, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"anti join expected:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"NLJ forbidden:\n$plan")
  }
}
