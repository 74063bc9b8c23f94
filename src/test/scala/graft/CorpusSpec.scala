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

  test("corpus_token_budget: cell counts, token sums and shares match a brute recount") {
    val docs = Tables.documents(s, d).select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2).split(" ", -1).length.toLong))
    val res = SparkEntry.queries("corpus_token_budget")(s, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val cells = docs.groupBy(dc => (dc._1, dc._2))
    assert(res.keySet == cells.keySet)
    val total = docs.map(_._3).sum
    cells.foreach { case (k, grp) =>
      val toks = grp.map(_._3).sum
      val share = (BigInt(1000000) * toks / total).toLong
      assert(res(k) == ((grp.length.toLong, toks, share)), s"$k: ${res(k)}")
    }
    // shares telescope to ~1e6 (floor loses < 1 per cell)
    val sum = res.values.map(_._3).sum
    assert(sum > 1000000L - res.size && sum <= 1000000L)
  }

  test("text_hapax: vocab, hapax and ratios match a brute per-source recount") {
    val docs = Tables.documents(s, d).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val res = SparkEntry.queries("text_hapax")(s, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val bySrc = docs.groupBy(_._1)
    assert(res.keySet == bySrc.keySet)
    bySrc.foreach { case (src, grp) =>
      val tf = grp.flatMap(_._2.toLowerCase.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val vocab = tf.size.toLong
      val hapax = tf.values.count(_ == 1L).toLong
      val nTok = tf.values.sum
      val hapaxE6 = (BigInt(1000000) * hapax / vocab).toLong
      val ttrE6 = (BigInt(1000000) * vocab / nTok).toLong
      assert(res(src) == ((vocab, hapax, nTok, hapaxE6, ttrE6)), s"$src: ${res(src)}")
    }
  }

  test("corpus_heaps: checkpoint curve and OLS slope match a brute trigram first-seen walk") {
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val lo = docs.map(_._1).min
    val dl = math.max(docs.map(_._1).max - lo, 1L)
    def bucket(id: Long): Long =
      math.min(16L, math.max(1L, (16L * (id - lo) + dl - 1L) / dl))
    // docs per bucket and trigram-type first-doc per bucket
    val dc = docs.groupBy(dc0 => bucket(dc0._1)).view.mapValues(_.length.toLong).toMap
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, text) =>
      val w = text.toLowerCase.split(" ", -1)
      if (w.length >= 3) (0 to w.length - 3).foreach { i =>
        val tri = w.slice(i, i + 3).mkString(" ")
        firstDoc.updateWith(tri)(o => Some(o.fold(id)(math.min(_, id))))
      }
    }
    val tc = firstDoc.values.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    // cumulative checkpoints, degenerate-excluded like the query
    var (xc, yc) = (0L, 0L)
    val pts = (1L to 16L).flatMap { k =>
      xc += dc.getOrElse(k, 0L); yc += tc.getOrElse(k, 0L)
      if (xc >= 1 && yc >= 1) Some((
        math.floor(math.log(xc.toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(yc.toDouble) * 1e6 + 0.5).toLong)) else None
    }
    val n = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val num = n * pts.map(p => BigInt(p._1) * p._2).sum - sx * sy
    val den = n * pts.map(p => BigInt(p._1) * p._1).sum - sx * sx
    def m9(x: BigInt): Long = (x.abs mod BigInt(1000000007)).toLong
    def ratE6b(a: BigInt, b: BigInt): Long = {
      var u = 0
      while (a / BigInt(10).pow(u) >= BigInt(10).pow(12) ||
             b / BigInt(10).pow(u) >= BigInt(10).pow(12)) u += 1
      ((BigInt(1000000) * (a / BigInt(10).pow(u))) /
        (b / BigInt(10).pow(u)).max(1)).toLong
    }
    val res = SparkEntry.queries("corpus_heaps")(s, d).collect()
    assert(res.length == 1)
    val row = res.head
    assert(row.getLong(0) == pts.length.toLong, "n checkpoints")
    assert(row.getLong(1) == m9(num), "num_m9")
    assert(row.getLong(2) == m9(den), "den_m9")
    assert(row.getLong(3) == num.signum * ratE6b(num.abs, den), "beta_e6")
    // a growing corpus teaches new trigrams sublinearly but teaches SOME:
    // 0 < beta < 1.5 (the trigram fix for the degenerate-flat unigram form)
    assert(row.getLong(3) > 0L && row.getLong(3) < 1500000L,
      s"heaps beta out of range: ${row.getLong(3)}")
  }

  test("text_ngram_coverage: totals and top-100 coverage match a brute trigram census") {
    val docs = Tables.documents(s, d).select("text").collect().map(_.getString(0))
    val tf = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { text =>
      val w = text.toLowerCase.split(" ", -1)
      if (w.length >= 3) (0 to w.length - 3).foreach { i =>
        val tri = w.slice(i, i + 3).mkString(" ")
        tf.updateWith(tri)(o => Some(o.getOrElse(0L) + 1L))
      }
    }
    val total = tf.values.sum
    val top = tf.toSeq.sortBy { case (t, c) => (-c, t) }.take(100)
    val topOcc = top.map(_._2).sum
    val covE6 = (BigInt(1000000) * topOcc / total).toLong
    val r = SparkEntry.queries("text_ngram_coverage")(s, d).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == tf.size.toLong, "n_types")
    assert(r(0).getLong(1) == total, "total_occ")
    assert(r(0).getLong(2) == math.min(100L, tf.size.toLong), "n_top")
    assert(r(0).getLong(3) == topOcc, "top_occ")
    assert(r(0).getLong(4) == covE6, "cov_e6")
    assert(covE6 > 0L && covE6 <= 1000000L)
  }

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
      // full coverage: the last (possibly short) window ends exactly at
      // the final token — no tail is ever dropped
      val (_, _, lastStart, lastN, _) = sorted.last
      assert(lastStart + lastN - 1 == w.length,
        s"doc $id tail uncovered: last window ends at ${lastStart + lastN - 1} of ${w.length}")
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

  test("corpus ops survive pathological docs: empty, 1-token, exact boundaries, repeats") {
    import s.implicits._
    // crafted corpus through the PRODUCTION path: written as a real
    // documents.parquet and fed to the same (spark, dir) query fns
    val docs = Seq(
      (0L, "", "en", "srcA", 0L),                                  // empty text
      (1L, "one", "en", "srcA", 3L),                               // single token
      (2L, "a b c d e f", "en", "srcB", 11L),                      // exactly one 6-chunk
      (3L, "a b c d e f g h", "en", "srcB", 15L),                  // exactly one 8-window
      (4L, "a b c d e f a b c d e f", "en", "srcC", 23L),          // chunk repeated IN one doc
      (5L, "a b c d e f x y z w v u", "en", "srcC", 23L),          // shares chunk with 2,3,4
      (6L, "p q r s t u v w x", "fr", "srcD", 17L),                // 9 tokens: 2 windows
    )
    val dir = "/tmp/graft_corpus_edge"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(dir))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    // chunk_overlap boundary arithmetic, pinned exactly: empty + 1-token
    // docs yield ONE short window; an exactly-8-token doc yields exactly
    // one full window (no spurious tail); a 9-token doc yields the full
    // window AND the short tail window that covers token 9
    val co = SparkEntry.queries("chunk_overlap")(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(co.filter(_._1 == 0L).toSeq == Seq((0L, 1L, 1L, 1L, "")))
    assert(co.filter(_._1 == 1L).toSeq == Seq((1L, 1L, 1L, 1L, "one")))
    assert(co.filter(_._1 == 3L).toSeq ==
      Seq((3L, 1L, 1L, 8L, "a b c d e f g h")))
    assert(co.filter(_._1 == 6L).map(_._5).toSeq ==
      Seq("p q r s t u v w", "t u v w x"))

    // dedup_strip: the "a b c d e f" chunk lives in docs 2,3(prefix of its
    // 6-chunk),4,5 -> stripped everywhere it appears as an ALIGNED chunk
    val dsRows = SparkEntry.queries("dedup_strip")(s, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ds = dsRows.map(t => t._1 -> t).toMap
    assert(dsRows.length == docs.length, "dedup_strip must be count-preserving")
    assert(ds(4L)._2 == "" && ds(4L)._4 == 2L,
      s"doc 4 is two copies of a duplicated chunk: ${ds(4L)}")
    assert(ds(0L)._3 + ds(0L)._4 == 1L) // the empty doc's single '' chunk
    assert(ds(6L)._4 == 0L, "the fr doc shares no chunk")
    // per-doc bookkeeping always adds up
    dsRows.foreach { case (id, _, kept, removed) =>
      val n = (docs.find(_._1 == id).get._2.split(" ", -1).length + 5) / 6
      assert(kept + removed == n.toLong, s"doc $id: $kept + $removed != $n")
    }

    // corpus_novelty: doc 4's repeated chunk is DISTINCT per doc (one
    // entry), first owner is doc 2; the empty-string chunk's owner is 0
    val nov = SparkEntry.queries("corpus_novelty")(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(nov == Seq(
      (0L, 1L, 1L), // '' first seen here
      (1L, 1L, 1L),
      (2L, 1L, 1L), // 'a b c d e f' first owner
      (3L, 2L, 1L), // shares chunk1 with doc 2; its tail 'g h' is novel
      (4L, 1L, 0L), // both chunks are 'a b c d e f' -> distinct 1, owned by 2
      (5L, 2L, 1L),
      (6L, 2L, 2L),
    ), s"novelty mismatch: $nov")

    rm(new java.io.File(dir))
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
