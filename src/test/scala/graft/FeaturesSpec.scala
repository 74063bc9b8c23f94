package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the Features suite: brute-force re-derivations plus
  * the ulp-margin guards for the ln-floor-scaled bigram model.
  */
class FeaturesSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterEach {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  override def afterEach(): Unit = { s.catalog.clearCache(); super.afterEach() }

  test("events_rolling matches a brute-force trailing-1h scan per user") {
    val res = SparkEntry.queries("events_rolling")(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val evs = Tables.events(s, d).select("event_id", "user_id", "ts_us", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    evs.groupBy(_._2).foreach { case (_, grp) =>
      grp.foreach { case (id, _, ts, _) =>
        val in = grp.filter(e => e._3 >= ts - 3600000000L && e._3 <= ts)
        val (n, v) = res(id)
        assert(n == in.length, s"event $id: n_1h $n != ${in.length}")
        assert(v == in.map(_._4).sum.toDouble / 100, s"event $id: v_1h mismatch")
      }
    }
    assert(res.values.exists(_._1 > 1), "some window must span multiple events")
  }

  test("embedding_centroid: quantize margins are safe and msd matches exact BigInt re-derivation") {
    val vecs = Tables.embeddings(s, d).select("vec_id", "label", "embedding")
      .collect().map(r => (r.getInt(1), r.getSeq[Float](2).toArray))
    // no floor-margin gate needed here: float->double, *1e6 and +0.5 are
    // IEEE-exact deterministic ops (unlike libm ln), so both engines floor
    // the bit-identical double — near-boundary components cannot diverge
    val res = SparkEntry.queries("embedding_centroid")(s, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    vecs.groupBy(_._1).foreach { case (label, grp) =>
      val n = grp.length
      val q = grp.map(_._2.map(f => math.floor(f.toDouble * 1000000 + 0.5).toLong))
      val dim = q.head.length
      val cent = (0 until dim).map(p => q.map(_(p)).sum).toArray
      val sd2 = q.map { v =>
        (0 until dim).map { p =>
          val t = BigInt(n.toLong * v(p) - cent(p)); t * t
        }.sum
      }.sum
      val want = (BigDecimal(sd2) / (BigDecimal(n) * n * n * BigDecimal("1e12")))
        .toDouble
      val (rn, msd) = res(label)
      assert(rn == n)
      assert(math.abs(msd - want) < 1e-9 * math.max(1.0, want), s"label $label msd $msd != $want")
      assert(msd > 0, "classes are not degenerate")
    }
  }

  test("text_bigram_logprob: ln floor margins are safe and scores match re-derivation") {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ")))
    val bigrams = docs.flatMap { case (_, lang, w) =>
      w.sliding(2).filter(_.length == 2).map(p => (lang, p(0), p(1)))
    }
    val cb = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cf = bigrams.groupBy(b => (b._1, b._2)).view.mapValues(_.length.toLong).toMap
    cb.foreach { case ((lang, w1, _), c) =>
      val x = math.log(c.toDouble / cf((lang, w1))) * 1e6 + 0.5
      val marginUlps = math.min(x - math.floor(x), math.ceil(x) - x) /
        math.ulp(math.max(math.abs(x), 1.0))
      assert(marginUlps > 1000, s"floor margin $marginUlps ulps for c=$c cf=${cf((lang, w1))}")
    }
    val res = SparkEntry.queries("text_bigram_logprob")(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    docs.foreach { case (id, lang, w) =>
      val lps = w.sliding(2).filter(_.length == 2).map { p =>
        math.floor(math.log(cb((lang, p(0), p(1))).toDouble / cf((lang, p(0)))) * 1e6 + 0.5).toLong
      }.toArray
      val (nBg, sumE6, avg) = res(id)
      assert(nBg == lps.length && sumE6 == lps.sum, s"doc $id bigram sums diverge")
      assert(avg == lps.sum.toDouble / (lps.length * 1e6))
      assert(avg <= 0, "bigram log-probs cannot be positive")
    }
  }

  test("triangle_count matches brute-force motif enumeration on the variant graph") {
    def lev3(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val names = Tables.part(s, d).select("p_name").distinct()
      .collect().map(_.getString(0)).sorted
    val edges = (for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last && lev3(a, b) <= 3
    } yield (a, b)).toSet
    val triPerNode = scala.collection.mutable.HashMap.empty[String, Long]
    for {
      a <- names; b <- names if a < b && edges((a, b))
      c <- names if b < c && edges((b, c)) && edges((a, c))
    } Seq(a, b, c).foreach(n => triPerNode(n) = triPerNode.getOrElse(n, 0L) + 1)
    val res = SparkEntry.queries("triangle_count")(s, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res == triPerNode.toMap, "per-node triangle counts diverge")
    assert(res.nonEmpty && res.values.sum % 3 == 0,
      "each triangle contributes exactly 3 node increments")
  }

  test("scale_minmax maps each type's min to 0, max to 1, everything else by exact cents ratio") {
    val evs = Tables.events(s, d).select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val res = SparkEntry.queries("scale_minmax")(s, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    evs.groupBy(_._2).foreach { case (_, grp) =>
      val (lo, hi) = (grp.map(_._3).min, grp.map(_._3).max)
      grp.foreach { case (id, _, vc) =>
        val want = if (hi == lo) 0.0 else (vc - lo).toDouble / (hi - lo)
        assert(res(id) == want, s"event $id scaled mismatch")
        assert(res(id) >= 0 && res(id) <= 1)
      }
      assert(grp.exists(e => res(e._1) == 0.0) && grp.exists(e => res(e._1) == 1.0))
    }
  }

  test("events_hourly_profile partitions all events into UTC hour cells with exact sums") {
    val evs = Tables.events(s, d).select("event_type", "ts_us", "value")
      .collect().map(r => (r.getString(0), (r.getLong(1) / 3600000000L % 24).toInt,
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val want = evs.groupBy(e => (e._1, e._2)).view
      .mapValues(g => (g.length.toLong, g.map(_._3).sum.toDouble / 100)).toMap
    val res = SparkEntry.queries("events_hourly_profile")(s, d).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(res == want.map { case (k, v) => k -> v }, "hourly cells diverge")
    assert(res.keys.forall { case (_, h) => h >= 0 && h <= 23 })
    assert(res.values.map(_._1).sum == evs.length, "cells must partition all events")
  }

  test("new-suite plan shapes: broadcasts where designed, no stray SMJ or cartesian") {
    def plan(k: String) =
      SparkEntry.queries(k)(s, d).queryExecution.executedPlan.toString
    // model/stats tables must broadcast back onto the big stream
    for (k <- Seq("feature_cdf", "embedding_centroid", "text_unigram_logprob",
        "text_bigram_logprob", "scale_minmax", "text_keyword_extract")) {
      val p = plan(k)
      assert(p.contains("BroadcastHashJoin"), s"$k: expected broadcast join:\n$p")
      assert(!p.contains("CartesianProduct"), s"$k: cartesian product leaked")
      assert(!p.contains("SortMergeJoin"), s"$k: small side should broadcast, not SMJ")
    }
    // events_rolling: exactly one exchange feeds the RANGE window
    val er = plan("events_rolling")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(er).length == 1, er)
    // histogram assignment is join-free: boundaries are inlined literals
    val he = plan("histogram_equidepth")
    assert(!he.contains("Join"), s"histogram_equidepth must not join:\n$he")
  }

  test("events_twa matches a BigInt time-weighted re-derivation per user") {
    val evs = Tables.events(s, d).select("user_id", "ts_us", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val res = SparkEntry.queries("events_twa")(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    evs.groupBy(_._1).foreach { case (uid, grp) =>
      val ordered = grp.sortBy(e => (e._2, e._3))
      val held = ordered.zip(ordered.tail).map { case ((_, t0, _, vc), (_, t1, _, _)) =>
        (BigInt(vc) * (t1 - t0), BigInt(t1 - t0))
      }
      if (held.isEmpty) assert(!res.contains(uid), s"user $uid with no held interval leaked")
      else {
        val (nHeld, twa) = res(uid)
        val want = held.map(_._1).sum.toDouble / held.map(_._2).sum.toDouble / 100
        assert(nHeld == held.length && twa == want, s"user $uid twa $twa != $want")
        val (lo, hi) = (ordered.map(_._4).min / 100.0, ordered.map(_._4).max / 100.0)
        assert(twa >= lo && twa <= hi, "TWA must sit inside the value range")
      }
    }
  }

  test("basket_pairs is the true top-20 of a brute-force basket recount") {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val typ = Tables.part(s, d).select("p_partkey", "p_name")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").last).toMap
    val brute = li.groupBy(_._1).values.flatMap { basket =>
      val ts = basket.map(e => typ(e._2)).distinct.sorted
      for (i <- ts.indices; j <- i + 1 until ts.length) yield (ts(i), ts(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }
    val res = SparkEntry.queries("basket_pairs")(s, d).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toSeq
    assert(res == brute.take(20), "top-20 basket pairs diverge")
    assert(res.forall { case ((a, b), _) => a < b })
  }

  test("basket_lift support/confidence/lift match local association statistics") {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val typ = Tables.part(s, d).select("p_partkey", "p_name")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").last).toMap
    val baskets = li.groupBy(_._1).values
      .map(b => b.map(e => typ(e._2)).distinct.sorted).toSeq
    val n = baskets.length
    val c1 = baskets.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cab = baskets.flatMap(ts =>
      for (i <- ts.indices; j <- i + 1 until ts.length) yield (ts(i), ts(j)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val res = SparkEntry.queries("basket_lift")(s, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(res.keySet == cab.keySet)
    res.foreach { case ((a, b), (c, sup, conf, lift)) =>
      assert(c == cab((a, b)))
      assert(sup == c.toDouble / n && conf == c.toDouble / c1(a))
      assert(lift == (n.toDouble * c) / (c1(a).toDouble * c1(b)), s"($a,$b) lift diverges")
    }
    // sanity: the statistics are discriminative on the fixture
    assert(res.values.exists(_._4 > 1.0) && res.values.exists(_._4 < 1.0),
      "lift should separate over- from under-represented pairs")
  }

  test("events_dau_wau matches local distinct-user counting and stickiness is in (0, 1]") {
    val du = Tables.events(s, d).select("ts_us", "user_id")
      .collect().map(r => (r.getLong(0) / 86400000000L, r.getLong(1))).distinct
    val res = SparkEntry.queries("events_dau_wau")(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    du.groupBy(e => (e._1 + 3) / 7).foreach { case (week, grp) =>
      val wau = grp.map(_._2).distinct.length.toLong
      val daus = grp.groupBy(_._1).view.mapValues(_.length).values.toSeq
      val meanDau = daus.sum.toDouble / daus.length
      val (rw, rm, rs) = res(week)
      assert(rw == wau && rm == meanDau, s"week $week diverges")
      assert(rs == meanDau / wau && rs > 0 && rs <= 1)
    }
    assert(res.size == du.map(e => (e._1 + 3) / 7).distinct.length)
  }

  test("revenue_gini matches an exact BigInt re-derivation and sits in [0, 1)") {
    val cr = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select("c_nationkey", "o_custkey", "o_totalprice")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val res = SparkEntry.queries("revenue_gini")(s, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    cr.groupBy(_._1).foreach { case (nat, grp) =>
      val byCust = grp.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
        .sortBy { case (ck, x) => (x, ck) }
      val n = byCust.length
      val six = byCust.zipWithIndex.map { case ((_, x), i) => BigInt(i + 1) * x }.sum
      val sx = byCust.map(e => BigInt(e._2)).sum
      val want = (2.0 * six.toDouble - (n + 1.0) * sx.toDouble) / (n.toDouble * sx.toDouble)
      val (rn, gini) = res(nat)
      assert(rn == n && gini == want, s"nation $nat gini $gini != $want")
      assert(gini >= 0 && gini < 1, s"nation $nat gini out of range")
    }
    assert(res.size == cr.map(_._1).distinct.length)
  }

  test("feature_cdf is the exact within-type empirical CDF") {
    val evs = Tables.events(s, d).select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val res = SparkEntry.queries("feature_cdf")(s, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    evs.groupBy(_._2).foreach { case (_, grp) =>
      val n = grp.length
      grp.foreach { case (id, _, vc) =>
        val want = grp.count(_._3 <= vc).toDouble / n
        assert(res(id) == want, s"event $id cdf ${res(id)} != $want")
      }
      // the max value of each type must map to exactly 1.0
      val maxIds = grp.filter(_._3 == grp.map(_._3).max)
      assert(maxIds.forall(e => res(e._1) == 1.0))
    }
    assert(res.size == evs.length)
  }

  test("dedup_name_variants clusters match a local union-find over brute-force distances") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val parts = Tables.part(s, d).select("p_name").collect().map(_.getString(0))
    val names = parts.distinct.sorted
    val parent = scala.collection.mutable.HashMap(names.map(n => n -> n): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last && lev(a, b) <= 2
    } { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val canonical = names.map(n => n -> names.filter(m => find(m) == find(n)).min).toMap
    val wantParts = parts.groupBy(canonical).view
      .mapValues(g => (g.distinct.length.toLong, g.length.toLong)).toMap
    val res = SparkEntry.queries("dedup_name_variants")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(res == wantParts.map { case (k, v) => k -> v },
      "cluster table diverges from local union-find")
    assert(res.values.map(_._2).sum == parts.length, "every part row is assigned")
    // the fixture's planted variant family actually merges
    val fam = names.filter(_.endsWith(" widget"))
    if (fam.exists(_.startsWith("cold")) && fam.exists(_.startsWith("old")))
      assert(canonical(fam.filter(_.startsWith("cold")).head) ==
        canonical(fam.filter(_.startsWith("old")).head))
    assert(res.size < names.length, "at least one variant family must merge")
  }

  test("embedding_project matches a BigInt re-derivation and planes are balanced") {
    def sign(i: Int, j: Int): Long = {
      val h = (BigInt(i.toLong * 64 + j + 1) * BigInt(2654435761L)) mod BigInt(4294967296L)
      if (h < BigInt(2147483648L)) 1L else -1L
    }
    // the hash plane family must be balanced, else the projection skews
    val plus = (for { i <- 0 until 8; j <- 0 until 64 } yield sign(i, j)).count(_ == 1L)
    assert(math.abs(plus - 256) <= 32, s"plane sign balance: $plus of 512 positive")
    val vecs = Tables.embeddings(s, d).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray
        .map(f => math.floor(f.toDouble * 1000000 + 0.5).toLong)))
    val res = SparkEntry.queries("embedding_project")(s, d).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1).split(",").map(_.toLong).toSeq, r.getLong(2)))).toMap
    assert(res.size == vecs.length)
    vecs.foreach { case (id, qv) =>
      val want = (0 until 8).map(i => (0 until 64).map(j => sign(i, j) * qv(j)).sum)
      val (proj, sum) = res(id)
      assert(proj == want, s"vec $id projection")
      assert(sum == want.sum, s"vec $id checksum")
    }
  }

  test("resample_ffill matches a brute-force forward fill over the hour grid") {
    val evs = Tables.events(s, d).select("event_type", "ts_us", "value").collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000000L, // truncating like div, incl. pre-epoch
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
    val hourly = evs.groupBy(e => (e._1, e._2)).view.mapValues(_.map(_._3).sum).toMap
    val hrs = hourly.keys.map(_._2)
    val (lo, hi) = (hrs.min, hrs.max)
    val types = hourly.keys.map(_._1).toSeq.distinct
    val rows = SparkEntry.queries("resample_ffill")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getBoolean(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(rows.size == types.size * (hi - lo + 1).toInt)
    types.foreach { t =>
      var lastSeen: Option[Long] = None
      (lo to hi).foreach { h =>
        val obs = hourly.get((t, h))
        if (obs.isDefined) lastSeen = obs
        val (gotObs, gotFill) = rows((t, h))
        assert(gotObs == obs.isDefined, s"($t,$h) observed flag")
        assert(gotFill == lastSeen, s"($t,$h) fill value")
      }
    }
    assert(rows.values.exists { case (o, f) => !o && f.isDefined },
      "the fixture must exercise at least one filled gap")
  }

  test("events_ohlc matches a brute-force per (type, day) open/high/low/close scan") {
    val evs = Tables.events(s, d).select("event_type", "ts_us", "event_id", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val want = evs.groupBy(e => (e._1, e._2 / 86400000000L)) // truncating like div
      .map { case (k, grp) =>
        val byTs = grp.sortBy(e => (e._2, e._3))
        k -> ((grp.length.toLong, byTs.head._4, grp.map(_._4).max,
          grp.map(_._4).min, byTs.last._4))
      }
    val rows = SparkEntry.queries("events_ohlc")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    assert(rows.map(_._1).toSet == want.keySet)
    rows.foreach { case (k, got) => assert(got == want(k), s"bar $k: $got != ${want(k)}") }
    // open != close somewhere, else the first/last selection is vacuous
    assert(rows.exists { case (_, (_, o, _, _, c)) => o != c })
  }

  test("graph_pagerank matches a driver-side integer PageRank re-derivation") {
    def lev(a: String, b: String): Int = {
      val m = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 0 to a.length) m(i)(0) = i
      for (j <- 0 to b.length) m(0)(j) = j
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val names = Tables.part(s, d).select("p_name").distinct()
      .collect().map(_.getString(0))
    val edges = names.groupBy(_.split(" ").last).values.toSeq.flatMap { grp =>
      val g = grp.toSeq
      for { a <- g; b <- g; if a < b && lev(a, b) <= 2 } yield (a, b)
    }
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = names.length.toLong
    val S = 1000000000000L
    var r = names.map(_ -> S / n).toMap
    for (_ <- 1 to 5) {
      val contrib = sym.groupBy(_._2).view
        .mapValues(_.map { case (u, _) => r(u) / deg(u) }.sum).toMap
      r = names.map(nm =>
        nm -> (15 * S / (100 * n) + 85 * contrib.getOrElse(nm, 0L) / 100)).toMap
    }
    val got = SparkEntry.queries("graph_pagerank")(s, d).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got.keySet == r.keySet)
    r.foreach { case (nm, pr) => assert(got(nm) == pr, s"$nm: ${got(nm)} != $pr") }
    // isolated nodes hold exactly the teleport mass; linked ones exceed it
    val teleport = 15 * S / (100 * n)
    val linked = deg.keySet
    names.filterNot(linked).foreach(nm => assert(got(nm) == teleport))
    assert(names.exists(nm => got(nm) > teleport), "some node must gain link mass")
  }

  test("sim_sparse_cosine: pairs match a brute rare-part weight re-derivation, both directions") {
    val om = Tables.orders(s, d).select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cp = Tables.lineitem(s, d).select("l_orderkey", "l_partkey").collect()
      .map(r => (om(r.getLong(0)), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dfm = cp.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nCust = cp.keys.map(_._1).toSet.size
    val idf = dfm.collect { case (p, df) if df >= 2 && df <= 20 =>
      p -> math.floor(math.log((nCust + 1.0) / (df + 1.0)) * 100000.0 + 0.5).toLong }
    val byC: Map[Long, Map[Long, Long]] = cp.toSeq
      .collect { case ((c, p), tf) if idf.contains(p) => (c, p, tf * idf(p)) }
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val norm2 = byC.view.mapValues(_.values.map(x => x * x).sum).toMap
    val custs = byC.keys.toSeq.sorted
    val brute = (for {
      ai <- custs.indices; bi <- (ai + 1) until custs.length
      a = custs(ai); b = custs(bi)
      shared = byC(a).keySet & byC(b).keySet
      if shared.size >= 2
      num = shared.toSeq.map(p => byC(a)(p) * byC(b)(p)).sum
      if BigInt(4) * BigInt(num) * num >= BigInt(norm2(a)) * norm2(b)
    } yield (a, b) -> ((shared.size.toLong, num, norm2(a), norm2(b)))).toMap
    val res = SparkEntry.queries("sim_sparse_cosine")(s, d).collect()
    assert(res.nonEmpty, "qualifying pairs must exist at sf0.001")
    val seen = res.map { r =>
      val key = (r.getLong(0), r.getLong(1))
      val (nsh, num, na, nb) = brute(key)
      assert(r.getLong(2) == nsh, s"$key n_shared")
      assert(r.getLong(3) == num, s"$key dot")
      assert(r.getLong(4) == na && r.getLong(5) == nb, s"$key norms")
      val cos2B = num.toDouble * num / (na.toDouble * nb.toDouble)
      assert(math.abs(r.getLong(6) / 1e6 - cos2B) <= 2e-6, s"$key cos2_e6")
      assert(r.getLong(6) >= 249998L, s"$key below the cos gate (cos2 >= 0.25)")
      key
    }.toSet
    assert(seen == brute.keySet, // completeness: nothing the gate admits is dropped
      s"missing=${(brute.keySet -- seen).take(5)} extra=${(seen -- brute.keySet).take(5)}")
  }

  test("parts_abc: class counts/revenue match a brute cumulative-share sweep") {
    val perPart = Tables.lineitem(s, d).select("l_partkey", "l_extendedprice")
      .collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5).toLong))
      .groupBy(_._1).view.mapValues(_.map(v => BigInt(v._2)).sum).toSeq
      .sortBy { case (pk, r) => (-r, pk) } // revenue desc, partkey asc
    val total = perPart.map(_._2).sum
    var cum = BigInt(0)
    val classed = perPart.map { case (_, r) =>
      cum += r
      val cls = if (5 * cum <= 4 * total) "A"
        else if (20 * cum <= 19 * total) "B" else "C"
      (cls, r)
    }
    val brute = classed.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.map(_._2).sum)).toMap
    val res = SparkEntry.queries("parts_abc")(s, d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(res.keySet == brute.keySet)
    brute.foreach { case (cls, (n, rev)) =>
      assert(res(cls).getLong(1) == n, s"$cls n_parts")
      assert(BigInt(res(cls).getLong(2)) == rev, s"$cls revenue_cents")
      val shareE6 = ((BigInt(1000000) * rev) / total).toLong
      assert(res(cls).getLong(3) == shareE6, s"$cls share_e6")
    }
    // class shares telescope to 1 (floor loses < 1e-6 per class)
    val shareSum = res.values.map(_.getLong(3)).sum
    assert(shareSum > 1000000L - 3 && shareSum <= 1000000L)
  }

  test("events_rolling_median: trailing-7d medians match a brute window scan") {
    val counts = Tables.events(s, d)
      .select(col("event_type"), expr("ts_us div 86400000000"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val res = SparkEntry.queries("events_rolling_median")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    // every observed (type, day) is an anchor; its window is the OBSERVED
    // days in [day-6, day]
    assert(res.keySet == counts.keySet, "anchor set = observed days")
    counts.keys.foreach { case (ty, day) =>
      val win = (day - 6 to day).flatMap(dd => counts.get((ty, dd))).sorted
      val w = win.length
      val medLo = win((w + 1) / 2 - 1) // min v with 2·rank ≥ w (lower median)
      assert(res((ty, day)) == ((w.toLong, medLo, win.sum)),
        s"($ty, $day): got ${res((ty, day))}, want ($w, $medLo, ${win.sum})")
    }
  }

  test("events_seasonality: dow counts match a brute epoch-day recount") {
    val evs = Tables.events(s, d)
      .select(col("event_type"), expr("ts_us div 86400000000"))
      .collect().map(r => (r.getString(0), ((r.getLong(1) + 3) % 7)))
    val brute = evs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totals = evs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val res = SparkEntry.queries("events_seasonality")(s, d).collect()
    assert(res.length == brute.size)
    res.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 6, "dow range")
      assert(r.getLong(2) == brute(key), s"$key n")
      assert(r.getLong(3) == totals(key._1), s"$key total")
      val idxE6 = ((BigInt(7000000) * brute(key)) / totals(key._1)).toLong
      assert(r.getLong(4) == idxE6, s"$key idx_e6")
    }
  }
}
