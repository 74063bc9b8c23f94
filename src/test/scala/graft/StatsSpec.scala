package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the Stats suite: each op re-derived by an
  * independent method, plus the ulp-margin guards that keep the
  * ln-floor-scaled ops (col_entropy, kl_divergence) engine-portable.
  */
class StatsSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterEach {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  override def afterEach(): Unit = { s.catalog.clearCache(); super.afterEach() }

  private def cents(x: Double): Long = math.floor(x * 100 + 0.5).toLong

  /** abs mod 1e9+7 — the bounded int64 digest every 128-bit moment ships
    * as (no decimal128 column may reach the driver's hash; r15 forensics:
    * the 7 hash-red keys were exactly the 7 emitting DECIMAL(38,0)). */
  private def m9(x: BigInt): Long = (x.abs mod BigInt(1000000007)).toLong

  /** BigInt replica of ExactRatio.ratE6Stages: common shift reducing BOTH
    * operands to ≤ 12 digits (so every Spark `div` quotient fits int64 —
    * ADVICE r15: the old 30-digit budget silently wrapped), floor-div,
    * greatest guard. Must stay EXACTLY in step with the production ladder. */
  private def ratE6b(a: BigInt, b: BigInt): Long = {
    var u = 0
    while (a / BigInt(10).pow(u) >= BigInt(10).pow(12) ||
           b / BigInt(10).pow(u) >= BigInt(10).pow(12)) u += 1
    val ap = a / BigInt(10).pow(u)
    val bp = (b / BigInt(10).pow(u)).max(1)
    ((BigInt(1000000) * ap) / bp).toLong
  }

  /** Exact interpolated quantile of sorted integers, scaled by `scale`
    * (scale must clear the position denominator for integer exactness). */
  private def qScaled(sorted: Array[Long], p: Double, scale: Long): Long = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val f = pos - lo
    val a = sorted(lo)
    val b = sorted(math.min(lo + 1, sorted.length - 1))
    math.round(scale * a + (b - a) * f * scale)
  }

  test("histogram_equidepth: bins partition the data and edges are the exact octile boundaries") {
    val res = SparkEntry.queries("histogram_equidepth")(s, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val vs = Tables.lineitem(s, d).select("l_extendedprice")
      .collect().map(r => cents(r.getDouble(0))).sorted
    val q8 = (1 to 7).map(k => qScaled(vs, k / 8.0, 8))
    // independent binning: count values on each side of every boundary
    val brute = vs.groupBy(v => 1 + q8.count(q => 8 * v > q))
      .view.mapValues(_.length.toLong).toMap
    assert(res.map(_._2).sum == vs.length, "bin counts must sum to total")
    res.foreach { case (bin, n, lo, hi) =>
      assert(brute(bin) == n, s"bin $bin: engine n=$n brute=${brute(bin)}")
      assert(lo <= hi && cents(lo) >= vs.head && cents(hi) <= vs.last)
    }
    // equi-depth within tie-tolerance: no bin further than 5% from n/8
    res.foreach { case (bin, n, _, _) =>
      assert(math.abs(n - vs.length / 8.0) < vs.length * 0.05, s"bin $bin size $n")
    }
    // bins are ordered and non-overlapping in value space
    res.sortBy(_._1).sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("outlier_mad: median, MAD and fence count match a direct re-derivation") {
    val res = SparkEntry.queries("outlier_mad")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    val rows = Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
      .collect().map(r => (r.getString(0), cents(r.getDouble(1))))
    rows.groupBy(_._1).foreach { case (flag, grp) =>
      val vs = grp.map(_._2).sorted
      val med2 = qScaled(vs, 0.5, 2)
      val dev2 = vs.map(v => math.abs(2 * v - med2)).sorted
      val m2 = qScaled(dev2, 0.5, 2)
      val nOut = dev2.count(dv => 2 * dv > 3 * m2).toLong
      val (n, med, mad, out) = res(flag)
      assert(n == vs.length && out == nOut, s"$flag: n/out mismatch ($n,$out) vs (${vs.length},$nOut)")
      assert(med == med2.toDouble / 200 && mad == m2.toDouble / 400, s"$flag: med/mad mismatch")
      assert(mad >= 0 && nOut < vs.length / 10, s"$flag: fence should flag a small tail")
    }
  }

  test("agg_percentile: p50_x10/p90_x10 match a driver-side sorted interpolation") {
    // ADVICE r16: both engines now execute the SAME hand-derived integer
    // interpolation, so the duck-vs-spark gate can no longer catch a
    // shared formula bug — this brute-force re-derivation (sort, pos =
    // p(n−1), linear interpolation, ×10) is the independent witness.
    val res = SparkEntry.queries("agg_percentile")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = Tables.lineitem(s, d).select("l_returnflag", "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1).toLong))
    rows.groupBy(_._1).foreach { case (flag, grp) =>
      val vs = grp.map(_._2).sorted
      val (p50, p90) = res(flag)
      assert(p50 == qScaled(vs, 0.5, 10), s"$flag p50_x10 $p50 vs ${qScaled(vs, 0.5, 10)}")
      assert(p90 == qScaled(vs, 0.9, 10), s"$flag p90_x10 $p90 vs ${qScaled(vs, 0.9, 10)}")
    }
    assert(res.nonEmpty)
  }

  test("col_entropy: ln floor margins are safe; entropy matches re-derivation and is bounded") {
    val counts = Tables.documents(s, d).groupBy("source", "lang").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val tot = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    counts.foreach { case (src, _, c) =>
      val x = math.log(c.toDouble / tot(src)) * 1e6 + 0.5
      val marginUlps = math.min(x - math.floor(x), math.ceil(x) - x) / math.ulp(x)
      assert(marginUlps > 1000, s"floor margin $marginUlps ulps for c=$c t=${tot(src)}")
    }
    val res = SparkEntry.queries("col_entropy")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    counts.groupBy(_._1).foreach { case (src, grp) =>
      val t = tot(src)
      val slp = grp.map { case (_, _, c) =>
        c * math.floor(math.log(c.toDouble / t) * 1e6 + 0.5).toLong
      }.sum
      val (nLangs, nDocs, h) = res(src)
      assert(nLangs == grp.length && nDocs == t)
      assert(h == -slp.toDouble / (t * 1e6), s"$src entropy mismatch")
      assert(h >= 0 && h <= math.log(nLangs.toDouble) + 1e-6,
        s"$src: entropy $h outside [0, ln($nLangs)]")
    }
  }

  test("kl_divergence: ln floor margins are safe; KL matches re-derivation and is ~non-negative") {
    val counts = Tables.documents(s, d).groupBy("source", "lang").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ts = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cg = counts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tg = counts.map(_._3).sum
    counts.foreach { case (src, lang, c) =>
      val x = math.log((c * tg).toDouble / (ts(src) * cg(lang)).toDouble) * 1e6 + 0.5
      val marginUlps = math.min(x - math.floor(x), math.ceil(x) - x) / math.ulp(math.max(math.abs(x), 1.0))
      assert(marginUlps > 1000, s"floor margin $marginUlps ulps for $src/$lang")
    }
    val res = SparkEntry.queries("kl_divergence")(s, d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    counts.groupBy(_._1).foreach { case (src, grp) =>
      val slr = grp.map { case (_, lang, c) =>
        c * math.floor(math.log((c * tg).toDouble / (ts(src) * cg(lang)).toDouble) * 1e6 + 0.5).toLong
      }.sum
      assert(res(src) == slr.toDouble / (ts(src) * 1e6), s"$src KL mismatch")
      // exact KL >= 0 (Gibbs); the e6 rounding can dip at most 0.5e-6/term
      assert(res(src) > -1e-5, s"$src: KL ${res(src)} below rounding floor")
    }
    assert(res.values.max > 0.01, "at least one source should diverge from the corpus")
  }

  test("class_rebalance keeps exactly the min-class count of lowest vec_ids per label") {
    val rows = Tables.embeddings(s, d).select("label", "vec_id")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val byLabel = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val m = byLabel.values.map(_.length).min
    val res = SparkEntry.queries("class_rebalance")(s, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(res.keySet == byLabel.keySet)
    byLabel.foreach { case (label, ids) =>
      val (nOrig, nKept, keptSum) = res(label)
      assert(nOrig == ids.length && nKept == m)
      assert(keptSum == ids.take(m).sum, s"label $label keeps wrong rows")
    }
  }

  test("ExactQuantiles matches local interpolated order statistics, including p=0/1 and 1-row groups") {
    import s.implicits._
    // skewed groups: one large, one small, one singleton
    val rows = (1 to 997).map(i => ("big", (i * 37 % 1000).toLong)) ++
      Seq(("small", 5L), ("small", 1L), ("small", 9L), ("one", 42L))
    val df = rows.toDF("g", "v").repartition(7)
    val ps = Seq(0.0, 0.125, 0.5, 0.875, 1.0)
    val got = operators.ExactQuantiles.groupedScaled(df, "g", "v", ps, 8)
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val vs = grp.map(_._2).sorted.toArray
      val want = ps.map { p =>
        val pos = p * (vs.length - 1)
        val lo = math.floor(pos).toInt
        val hi = math.min(lo + 1, vs.length - 1)
        math.round(8 * vs(lo) + (vs(hi) - vs(lo)) * ((pos - lo) * 8))
      }
      assert(got(g).toSeq == want, s"group $g: ${got(g).toSeq} != $want")
    }
    // ungrouped wrapper agrees with the grouped path
    val flat = operators.ExactQuantiles.scaled(df.select("v"), "v", Seq(0.5), 2)
    val all = rows.map(_._2).sorted.toArray
    val pos = 0.5 * (all.length - 1)
    val lo = math.floor(pos).toInt
    assert(flat.head == math.round(
      2 * all(lo) + (all(math.min(lo + 1, all.length - 1)) - all(lo)) * ((pos - lo) * 2)))
  }

  test("scale_winsorize boundaries, clip counts and sum match local re-derivation") {
    val rows = Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
      .collect().map(r => (r.getString(0), cents(r.getDouble(1))))
    val res = SparkEntry.queries("scale_winsorize")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    rows.groupBy(_._1).foreach { case (flag, grp) =>
      val vs = grp.map(_._2).sorted
      val lo8 = qScaled(vs, 1.0 / 8, 8)
      val hi8 = qScaled(vs, 7.0 / 8, 8)
      val clipLo = vs.count(v => 8 * v < lo8).toLong
      val clipHi = vs.count(v => 8 * v > hi8).toLong
      val wsum = vs.map(v => BigInt(
        if (8 * v < lo8) lo8 else if (8 * v > hi8) hi8 else 8 * v)).sum
      val (n, cl, ch, ws) = res(flag)
      assert(n == vs.length && cl == clipLo && ch == clipHi, s"$flag clip counts diverge")
      assert(ws == (BigDecimal(wsum) / 800).toDouble, s"$flag winsorized sum diverges")
      // rank-based cuts: at most ~n/8 clipped on each side (+1 for interpolation)
      assert(cl <= vs.length / 8 + 1 && ch <= vs.length / 8 + 1)
      assert(cl > 0 && ch > 0, "octile cuts must actually clip a tail")
    }
  }

  test("events_anomaly_days: exact integer test equals the 2-sigma rule, re-derived") {
    val counts = Tables.events(s, d)
      .select(col("event_type"), expr("cast(ts_us div 86400000000 as bigint)").as("day"))
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val res = SparkEntry.queries("events_anomaly_days")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    counts.groupBy(_._1).foreach { case (_, grp) =>
      val n = BigInt(grp.length)
      val ss = grp.map(e => BigInt(e._3)).sum
      val q = grp.map(e => BigInt(e._3) * e._3).sum
      grp.foreach { case (typ, day, c) =>
        val lhs = (BigInt(c) * n - ss).pow(2)
        val rhs = 4 * (n * q - ss * ss)
        val (rc, flag) = res((typ, day))
        assert(rc == c && flag == (lhs > rhs), s"($typ,$day) anomaly flag diverges")
      }
    }
    assert(res.size == counts.length && res.values.exists(_._2),
      "fixture should contain at least one anomalous day")
    assert(res.values.count(_._2) < res.size / 4, "anomalies must be rare")
  }

  test("text_keyword_extract: idf floor margins are safe and top-3 matches brute force") {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    val nd = docs.groupBy(_._2).view.mapValues(_.length).toMap
    val dfm = docs.flatMap { case (id, lang, ts) => ts.distinct.map(t => (lang, t) -> id) }
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val idf = dfm.map { case ((lang, t), df) =>
      val x = math.log((nd(lang) + 1.0) / (df + 1.0)) * 1e6 + 0.5
      val marginUlps = math.min(x - math.floor(x), math.ceil(x) - x) /
        math.ulp(math.max(math.abs(x), 1.0))
      assert(marginUlps > 1000, s"idf floor margin $marginUlps ulps for $lang/$t")
      (lang, t) -> math.floor(x).toLong
    }
    val res = SparkEntry.queries("text_keyword_extract")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt) -> ((r.getString(2), r.getLong(3)))).toMap
    docs.foreach { case (id, lang, ts) =>
      val scored = ts.groupBy(identity).map { case (t, g) =>
        (t, g.length.toLong * idf((lang, t)))
      }.toSeq.sortBy { case (t, sc) => (-sc, t) }
      scored.take(3).zipWithIndex.foreach { case ((t, sc), i) =>
        assert(res((id, i + 1)) == ((t, sc)), s"doc $id rank ${i + 1} diverges")
      }
    }
    assert(res.size == docs.length * 3)
  }

  test("agg_approx_percentile: sketch stays within GK rank-error of the exact quartiles") {
    val res = SparkEntry.queries("agg_approx_percentile")(s, d).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    assert(res.map(_._1).toSeq == Seq(0.25, 0.5, 0.75))
    val vs = Tables.lineitem(s, d).select("l_extendedprice")
      .collect().map(r => cents(r.getDouble(0))).sorted
    res.zip(Seq(0.25, 0.5, 0.75)).foreach { case ((p, approx, exact), pp) =>
      assert(p == pp)
      // rank-error gate: percentile_approx(accuracy=10000) guarantees the
      // returned value's rank is within n/10000 of the target rank
      val rank = vs.count(_ <= approx)
      val target = pp * vs.length
      assert(math.abs(rank - target) <= vs.length / 10000.0 + 1,
        s"p=$pp: rank $rank vs target $target")
      // and the exact column really is the exact interpolated quartile
      assert(exact == qScaled(vs, pp, 4).toDouble / 4, s"p=$pp exact column diverges")
    }
  }

  test("skew_profile stats match a local per-key count distribution") {
    val counts = Tables.orders(s, d).groupBy("o_custkey").count()
      .collect().map(_.getLong(1)).sorted
    val res = SparkEntry.queries("skew_profile")(s, d).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(res("n_keys") == counts.length.toDouble)
    assert(res("n_rows") == counts.sum.toDouble)
    val expect = Map("p000" -> 0.0, "p250" -> 0.25, "p500" -> 0.5,
      "p750" -> 0.75, "p875" -> 7.0 / 8, "p1000" -> 1.0)
    expect.foreach { case (stat, p) =>
      assert(res(stat) == qScaled(counts, p, 8).toDouble / 8, s"$stat diverges")
    }
    // sane ordering of the profile
    assert(res("p000") <= res("p500") && res("p500") <= res("p1000"))
    assert(res.size == 8)
  }

  test("orders_rfm cells match a local quartile-score re-derivation") {
    val rfm = Tables.orders(s, d)
      .select(col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000").as("day"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("cents"))
      .groupBy("o_custkey")
      .agg(max("day").as("r"), count(lit(1)).as("f"), sum("cents").as("m"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    def bounds(xs: Array[Long]) = Seq(0.25, 0.5, 0.75).map(p => qScaled(xs.sorted, p, 4))
    val (rb, fb, mb) = (bounds(rfm.map(_._1)), bounds(rfm.map(_._2)), bounds(rfm.map(_._3)))
    def score(v: Long, bs: Seq[Long]) = 1 + bs.count(b => 4 * v > b)
    val want = rfm.map { case (r, f, m) => (score(r, rb), score(f, fb), score(m, mb)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val res = SparkEntry.queries("orders_rfm")(s, d).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(res == want, "RFM cell counts diverge from local scoring")
    assert(res.values.sum == rfm.length, "cells must partition all customers")
    assert(res.keys.forall { case (a, b, c) =>
      Seq(a, b, c).forall(x => x >= 1 && x <= 4) })
  }

  test("text_compressibility is deterministic and separates repetitive from organic text") {
    val run1 = SparkEntry.queries("text_compressibility")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val run2 = SparkEntry.queries("text_compressibility")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(run1.toSeq == run2.toSeq, "deflate output must be run-stable")
    assert(run1.forall { case (_, n, ratio) => n > 0 && ratio > 0 && ratio < 1.5 })
    // a planted pathologically-repetitive doc must compress below every
    // fixture doc (same deflate level and strategy as the production UDF)
    val ratios = run1.map(_._3)
    val deflater = new java.util.zip.Deflater(6, false)
    val in = ("lorem " * 60).trim.getBytes("UTF-8")
    deflater.setInput(in); deflater.finish()
    val buf = new Array[Byte](in.length + 64)
    var total = 0L
    while (!deflater.finished()) total += deflater.deflate(buf)
    deflater.end()
    val plantedRatio = total.toDouble / in.length
    assert(ratios.forall(_ > plantedRatio),
      s"repetitive text ($plantedRatio) must compress below all organic docs (min ${ratios.min})")
  }

  test("ExactQuantiles skips NULL values and NULL group keys (quantile_cont semantics)") {
    import s.implicits._
    val df = Seq((Option("a"), Option(1L)), (Option("a"), Option(3L)),
      (Option("a"), Option.empty[Long]),        // NULL value: skipped
      (Option.empty[String], Option(7L)),       // NULL group key: excluded
      (Option("b"), Option.empty[Long]))        // all-NULL group: absent
      .toDF("g", "v")
    val got = operators.ExactQuantiles.groupedScaled(df, "g", "v", Seq(0.5), 2)
    // median of {1, 3} is 2 -> x2 = 4; a NULL read as 0 would give 1 instead
    assert(got.keySet == Set("a"), s"unexpected groups: ${got.keySet}")
    assert(got("a").toSeq == Seq(4L))
  }

  test("skew_profile on an empty orders table emits the oracle's 8 NULL-valued stat rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf").toString
    Tables.orders(s, d).limit(0).write.parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("skew_profile")(s, dir).collect()
    assert(rows.length == 8)
    val byStat = rows.map(r => r.getString(0) -> (if (r.isNullAt(1)) None
      else Some(r.getDouble(1)))).toMap
    // quantile_cont and sum over zero rows are NULL in the oracle;
    // count(*) is 0 — the Spark path must mirror that, not zero-fill
    assert(byStat("n_keys").contains(0.0))
    assert((byStat - "n_keys").values.forall(_.isEmpty),
      s"expected NULLs on empty input, got $byStat")
  }

  test("randomized: ExactQuantiles matches local interpolation on 6 seeded shapes") {
    import s.implicits._
    for (seed <- 1 to 6) {
      var x = seed.toLong * 2654435761L
      def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); math.abs(x) }
      val n = 1 + (next() % 300).toInt
      val nGroups = 1 + (next() % 4).toInt
      val domain = 1 + (next() % 50).toInt // duplicates guaranteed when small
      val rows = (0 until n).map(_ => (s"g${next() % nGroups}", next() % domain))
      val df = rows.toDF("g", "v").repartition(1 + (next() % 9).toInt)
      val ps = Seq(0.0, 0.125, 0.25, 0.5, 0.75, 0.875, 1.0)
      val got = operators.ExactQuantiles.groupedScaled(df, "g", "v", ps, 8)
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val vs = grp.map(_._2).sorted.toArray
        val want = ps.map(p => qScaled(vs, p, 8))
        assert(got(g).toSeq == want, s"seed $seed group $g: ${got(g).toSeq} != $want")
      }
      assert(got.keySet == rows.map(_._1).toSet)
    }
  }

  test("drift_psi: contributions nonneg, ln margins safe, matches re-derivation") {
    val evs = Tables.events(s, d).select("event_type", "ts_us").collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400000000L)) // truncating like div
    val days = evs.map(_._2)
    val mid = (days.min + days.max + 1) / 2
    val cnt = evs.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2 < mid).toLong, g.count(_._2 >= mid).toLong)
    }.toMap.filter { case (_, (a, b)) => a > 0 && b > 0 }
    val tRef = cnt.values.map(_._1).sum
    val tCur = cnt.values.map(_._2).sum
    val rows = SparkEntry.queries("drift_psi")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet == cnt.keySet)
    rows.foreach { case (t, nr, nc, psi) =>
      val (wr, wc) = cnt(t)
      assert(nr == wr && nc == wc, s"$t half counts")
      val p = BigInt(nr) * tCur
      val q = BigInt(nc) * tRef
      val x = math.log(p.toDouble / q.toDouble) * 1e6 + 0.5
      val marginUlps = math.min(x - math.floor(x), math.ceil(x) - x) /
        math.ulp(math.max(math.abs(x), 1.0))
      assert(marginUlps > 1000, s"$t ln floor margin $marginUlps ulps")
      val lr = math.floor(x).toLong
      val want = (BigDecimal(p - q) * BigDecimal(lr)).toDouble /
        ((BigInt(tRef) * BigInt(tCur)).toDouble * 1e6)
      assert(psi == want, s"$t psi $psi != $want")
      assert(psi >= 0.0, s"$t PSI term must be nonnegative")
    }
    assert(rows.exists(_._4 > 0), "some type must drift on this fixture")
  }

  test("token_pmi matches brute-force co-occurrence and ln margins are safe") {
    val docs = Tables.documents(s, d).select("text").collect()
      .map(_.getString(0).toLowerCase.split(" ", -1).distinct.sorted) // -1: keep trailing empties like split()/string_split
    val nDocs = docs.length.toLong
    val c1 = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cab = docs.flatMap { ts =>
      for { i <- ts.indices; j <- i + 1 until ts.length } yield (ts(i), ts(j))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val top = cab.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.take(50)
    val res = SparkEntry.queries("token_pmi")(s, d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(res.length == top.length)
    res.zip(top).foreach { case ((a, b, c, pmiE6), ((wa, wb), wc)) =>
      assert(a == wa && b == wb && c == wc, s"pair ($a,$b) rank/count")
      val p = BigInt(c) * nDocs
      val q = BigInt(c1(a)) * c1(b)
      val x = math.log(p.toDouble / q.toDouble) * 1e6 + 0.5
      val marginUlps = math.min(x - math.floor(x), math.ceil(x) - x) /
        math.ulp(math.max(math.abs(x), 1.0))
      assert(marginUlps > 1000, s"($a,$b) ln floor margin $marginUlps ulps")
      assert(pmiE6 == math.floor(x).toLong, s"($a,$b) pmi_e6")
    }
    // the score must discriminate: the top-count pairs cannot all carry
    // the same association strength on this fixture
    assert(res.map(_._4).distinct.length > 10 && res.exists(_._4 > 0))
  }

  test("bpe_apply_merge recount matches a brute-force merge of the winning pair") {
    val toks = Tables.documents(s, d).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" "))
    val top = toks.filter(_.length >= 2).flatMap(t => t.sliding(2))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (p, c) => (-c, p) }.head._1
    // java String.replace is left-to-right non-overlapping — the greedy
    // BPE application order both engines' replace() implements
    val brute = toks.map(_.replace(top, "\u0001")).filter(_.length >= 2)
      .flatMap(t => t.sliding(2)).map(_.replace("\u0001", top))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (p, c) => (-c, p) }
    val res = SparkEntry.queries("bpe_apply_merge")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(res.toSeq == brute.take(50), "merged-pair recount diverges from brute force")
    assert(res.exists(p => p._1.length == 3 && p._1.contains(top)),
      "some pair must contain the expanded merged symbol")
  }

  test("bpe_train learns exactly the brute-force 6-round merge table") {
    var layer = Tables.documents(s, d).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" "))
    val merges = collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    for (k <- 1 to 6) {
      val (pair, cnt) = layer.filter(_.length >= 2).flatMap(_.sliding(2))
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (p, c) => (-c, p) }.head
      merges += ((k, pair, cnt))
      layer = layer.map(_.replace(pair, k.toChar.toString))
    }
    val expanded = Array.ofDim[String](7)
    for (k <- 1 to 6)
      expanded(k) = (k - 1 to 1 by -1).foldLeft(merges(k - 1)._2)(
        (acc, j) => acc.replace(j.toChar.toString, expanded(j)))
    val expect = merges.map { case (k, _, c) => (k, expanded(k), c) }.toSeq
    val res = SparkEntry.queries("bpe_train")(s, d).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(res == expect, "merge table diverges from brute force")
    // BPE invariants: counts never increase round-over-round (a merge can
    // only remove or re-bound pair occurrences), and expansions are
    // sentinel-free readable text of >= 2 chars
    assert(res.map(_._3) == res.map(_._3).sorted.reverse)
    assert(res.forall { case (_, p, _) => p.length >= 2 && p.forall(_ >= ' ') })
  }

  test("HLL sketches are mergeable: daily sketch union re-aggregates to weekly uniques") {
    // the 100 TB re-aggregation pattern the plain approx_count_distinct
    // CANNOT express: per-day HLL register sketches are stored once
    // (map-combinable binary column), and any coarser rollup — week,
    // month, all-time — is a cheap union over the STORED sketches, never
    // a rescan of the raw events. Spark 4 surface: hll_sketch_agg /
    // hll_union_agg / hll_sketch_estimate (DataSketches HLL); no DuckDB
    // twin (engine-specific registers), so this is a ✗-capability row
    // gated here: the merged weekly estimate must agree with the
    // single-pass weekly sketch and land within HLL error of the truth.
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr("date_trunc('DAY', ts_ntz)").as("day"))
      .withColumn("week", expr("date_trunc('WEEK', day)"))
    val daily = ev.groupBy("week", "day").agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val weeklyMerged = daily.groupBy("week")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("merged"))
    val weeklyDirect = ev.groupBy("week")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("direct"),
        countDistinct("user_id").as("exact"))
    val joined = weeklyMerged.join(weeklyDirect, "week").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (merged, direct, exact) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(merged == direct,
        s"sketch-of-union must equal union-of-sketches: $merged vs $direct")
      assert(math.abs(merged - exact).toDouble / exact < 0.05,
        s"HLL estimate $merged outside 5% of exact $exact")
    }
  }

  test("agg_weighted_median: quartiles satisfy the lower-weighted-quantile definition on a brute recount") {
    val rows = Tables.lineitem(s, d).select("l_returnflag", "l_quantity", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getDouble(1).toLong, cents(r.getDouble(2))))
    val res = SparkEntry.queries("agg_weighted_median")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val flags = rows.map(_._1).distinct
    assert(res.keySet == flags.toSet)
    flags.foreach { flag =>
      val grp = rows.filter(_._1 == flag)
      val byQ = grp.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val total = byQ.map(_._2).sum
      val (wTotal, q25, q50, q75) = res(flag)
      assert(wTotal == total, s"$flag: w_total $wTotal vs brute $total")
      // lower weighted p-quantile: smallest q whose cumulative weight
      // reaches p·total — re-derived by direct scan of the cum table
      def brute(num: Long, den: Long): Long = {
        var cum = 0L
        byQ.find { case (_, w) => cum += w; cum * den >= num * total }.get._1
      }
      assert(q25 == brute(1, 4), s"$flag wq25")
      assert(q50 == brute(1, 2), s"$flag wq50")
      assert(q75 == brute(3, 4), s"$flag wq75")
      // the defining inequality pair for the median: weight at or below
      // q50 covers half; strictly below does not
      val below = byQ.filter(_._1 < q50).map(_._2).sum
      val atOrBelow = byQ.filter(_._1 <= q50).map(_._2).sum
      assert(2 * atOrBelow >= total && 2 * below < total, s"$flag median property")
    }
  }

  test("stats_levene: median deviations and BF-F match a brute BigInt re-derivation") {
    val evs = Tables.events(s, d).select(col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val res = SparkEntry.queries("stats_levene")(s, d).collect()
    assert(res.length == 1)
    val row = res.head
    // brute: per-type doubled median from the sorted values (lower middle
    // + upper middle — exact under any tie pattern), then |2v - med2|
    val groups = evs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val zByG = groups.map { case (g, vs) =>
      val n = vs.length
      val med2 = vs((n - 1) / 2) + vs(n / 2)
      g -> vs.map(v => math.abs(2 * v - med2))
    }
    val k = BigInt(zByG.size)
    val n = BigInt(zByG.values.map(_.length).sum)
    val sAll = zByG.values.flatten.map(BigInt(_)).sum
    val ssAll = zByG.values.flatten.map(z => BigInt(z) * z).sum
    val sstN = n * ssAll - sAll * sAll
    val ssb = zByG.values.map { zs =>
      val ng = BigInt(zs.length)
      val sg = zs.map(BigInt(_)).sum
      val num = (sg * n - sAll * ng).pow(2)
      math.floor(num.toDouble / (ng.toDouble * n.toDouble * n.toDouble) + 0.5).toLong
    }.sum
    assert(row.getLong(0) == k.toLong && row.getLong(1) == n.toLong)
    assert(row.getLong(2) == m9(sstN), "sst_m9")
    assert(row.getLong(3) == ssb, s"ssb_c2 ${row.getLong(3)} vs brute $ssb")
    // division-free operands: f = ssb·(n−k)·n/(ssw_e·(k−1)), η² = ssb·n/sst_n
    val ssbB = BigInt(ssb)
    val sswE = (sstN - n * ssbB).max(1)
    assert(row.getLong(4) == ratE6b(ssbB * (n - k) * n, sswE * (k - 1)), "f_e6")
    assert(row.getLong(5) == ratE6b(ssbB * n, sstN), "eta2_e6")
    // BF on a mixed-variance fixture should register a positive statistic
    assert(row.getLong(4) > 0L && row.getLong(5) >= 0L && row.getLong(5) <= 1000000L)
  }

  test("stats_runs_test: runs, split counts and z2_e6 match a brute day-walk") {
    val evs = Tables.events(s, d).select(col("event_type"),
        expr("cast(ts_us div 86400000000 as bigint)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val res = SparkEntry.queries("stats_runs_test")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))).toMap
    var checked = 0
    evs.groupBy(_._1).foreach { case (ty, rows) =>
      val daily = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val counts = daily.values.toSeq.sorted
      val nD = counts.length
      val med2 = counts((nD - 1) / 2) + counts(nD / 2)
      // signs in day order, median ties dropped (the standard treatment)
      val signs = daily.toSeq.sortBy(_._1)
        .collect { case (_, c) if 2 * c != med2 => if (2 * c > med2) 1 else -1 }
      val n1 = signs.count(_ == 1).toLong
      val n2 = signs.count(_ == -1).toLong
      val n = n1 + n2
      if (n1 >= 1 && n2 >= 1 && 2 * n1 * n2 > n) {
        val runs = 1L + signs.sliding(2).count(p => p.length == 2 && p(0) != p(1))
        val a = BigInt((runs - 1) * n) - BigInt(2) * n1 * n2
        val z2 = ratE6b(a * a * (n - 1), BigInt(2) * n1 * n2 * (BigInt(2) * n1 * n2 - n))
        assert(res(ty) == ((n, runs, n1, n2, z2, a.signum)), s"$ty: ${res(ty)}")
        checked += 1
      } else assert(!res.contains(ty), s"$ty one-sided series must be excluded")
    }
    assert(checked > 0 && res.size == checked)
  }

  test("events_burstiness: moments and fano_e6 match a brute BigInt re-derivation") {
    val evs = Tables.events(s, d).select(col("event_type"),
        expr("cast(ts_us div 86400000000 as bigint)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val res = SparkEntry.queries("events_burstiness")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    var checked = 0
    evs.groupBy(_._1).foreach { case (ty, rows) =>
      val daily = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val n = BigInt(daily.size)
      val sc = daily.values.map(BigInt(_)).sum
      if (n >= 2 && sc > 0) {
        val scc = daily.values.map(c => BigInt(c) * c).sum
        val varN2 = n * scc - sc * sc
        val fanoE6 = ((BigInt(1000000) * varN2) / (n * sc)).toLong
        assert(res(ty) == ((n.toLong, sc.toLong, m9(varN2), fanoE6)), s"$ty: ${res(ty)}")
        // Poisson-ish fixture traffic should not look metronomic: the
        // Fano factor must be meaningfully positive somewhere
        checked += 1
      } else assert(!res.contains(ty), s"$ty degenerate must be excluded")
    }
    assert(checked > 0 && res.size == checked)
    assert(res.values.exists(_._4 > 0L), "all-zero Fano would be vacuous")
  }

  test("GroupedRanks: the range-partitioned doubled rank equals the window form exactly") {
    import s.implicits._
    // 1) adversarial synthetic: heavy ties, skewed groups, a singleton
    val rows = (1L to 400L).map(i => (s"g${i % 3}", (i * 7 % 11), 1L)) ++
      Seq(("solo", 42L, 5L))
    val df = rows.toDF("g", "v", "w").repartition(9)
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val swap = canon(operators.GroupedRanks.doubled(df, "g", "v", "w"))
    val win = canon(operators.GroupedRanks.doubledWindowForm(df, "g", "v", "w"))
    assert(swap == win, "physical swap changed rank values on synthetic ties")
    // doubled ranks sum to n(n+1) per group — the tie-handling invariant
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val n = grp.map(_._3).sum
      val got = swap.filter(_._1 == g).map(t => t._3 * t._4).sum
      assert(got == n * (n + 1), s"$g rank-sum invariant")
    }
    // 2) the real stats_spearman regime: few giant groups on lineitem —
    // the exact data the window form ranks today
    val b = Tables.lineitem(s, d).select(col("l_returnflag").as("g"),
      expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").as("v"),
      lit(1L).as("w"))
    val swapL = canon(operators.GroupedRanks.doubled(b, "g", "v", "w"))
    val winL = canon(operators.GroupedRanks.doubledWindowForm(b, "g", "v", "w"))
    assert(swapL == winL, "physical swap changed rank values on the fixture")
  }

  test("WeightedQuantiles: exact lower quantiles on skewed/tied synthetic weights") {
    import s.implicits._
    // adversarial: duplicate values across input rows (domain reduction
    // must merge them), one group where a single value carries most of
    // the weight, exact-boundary weights (cum hits p·total exactly)
    val rows = Seq(
      ("a", 10L, 1L), ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 4L),
      ("b", 5L, 3L), ("b", 6L, 1L), ("b", 7L, 0L), ("b", 9L, 4L),
      ("c", 1L, 100L), ("c", 2L, 1L))
    val df = rows.toDF("g", "v", "w").repartition(5)
    val got = operators.WeightedQuantiles.of(df, "g", "v", "w",
      Seq((1, 4, "q25"), (1, 2, "q50"), (3, 4, "q75"), (1, 1, "q100")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val dom = grp.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tw = dom.map(_._2).sum
      def q(num: Long, den: Long): Long = {
        var cw = 0L
        dom.collectFirst { case (v, w) if { cw += w; den * cw >= num * tw } => v }.get
      }
      assert(got(g) == ((tw, q(1, 4), q(1, 2), q(3, 4), q(1, 1))),
        s"group $g: got ${got(g)}")
    }
    // boundary semantics pinned: in group a (tw=8), cum at v=20 is
    // exactly 4 = tw/2, so the lower median is 20, not 30
    assert(got("a")._3 == 20L, "exact-boundary tie must take the lower value")
    // degenerate dominance: a 100-weight value is every quantile
    assert(got("c") == ((101L, 1L, 1L, 1L, 2L)))
  }

  test("stats_cramers_v: chi-square matches a brute contingency recount; V in [0,1]") {
    val cust = Tables.customer(s, d).select("c_mktsegment", "c_nationkey")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val cells = cust.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = cust.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = cust.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = cust.length.toLong
    // the same per-cell ×1e9 floor-scaled integer the query sums — brute
    // recount with the identical expression shape
    val chi2_9 = cells.map { case ((seg, nat), o) =>
      val e = rt(seg).toDouble * ct(nat) / n
      val dev = o.toDouble - e
      math.floor(dev * dev / e * 1e9 + 0.5).toLong
    }.sum
    val r = SparkEntry.queries("stats_cramers_v")(s, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == rt.size && row.getLong(2) == ct.size)
    assert(row.getLong(3) == chi2_9, s"chi2_9 ${row.getLong(3)} vs brute $chi2_9")
    val v2E6 = ((BigInt(1000000) * chi2_9) /
      (BigInt(1000000000) * n * math.max(math.min(rt.size, ct.size) - 1, 1))).toLong
    assert(row.getLong(4) == v2E6, s"v2_e6 ${row.getLong(4)} vs brute $v2E6")
    assert(row.getLong(4) >= 0L && row.getLong(4) <= 1000000L)
  }

  test("stats_ks_test: D matches a brute sorted-CDF re-derivation per type") {
    val evs = Tables.events(s, d).select(col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"),
        expr("cast(ts_us div 86400000000 as bigint)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val days = evs.map(_._3)
    val m = (days.min + days.max + 1) / 2
    val res = SparkEntry.queries("stats_ks_test")(s, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val byType = evs.groupBy(_._1)
    var checked = 0
    byType.foreach { case (ty, rows) =>
      val h1 = rows.filter(_._3 < m).map(_._2)
      val h2 = rows.filter(_._3 >= m).map(_._2)
      if (h1.nonEmpty && h2.nonEmpty) {
        val (n1, n2) = (h1.length.toLong, h2.length.toLong)
        // sup over the pooled value domain of |F1*n2 - F2*n1| — the KS
        // numerator re-derived by direct counting, no windows anywhere
        val dnum = (h1 ++ h2).distinct.map(x =>
          math.abs(h1.count(_ <= x) * n2 - h2.count(_ <= x) * n1)).max
        val (rn1, rn2, rd, dE6) = res(ty)
        assert(rn1 == n1 && rn2 == n2, s"$ty half sizes")
        assert(rd == dnum, s"$ty: d_num $rd vs brute $dnum")
        val dE6B = ((BigInt(1000000) * dnum) / (BigInt(n1) * n2)).toLong
        assert(dE6 == dE6B, s"$ty d_e6 $dE6 vs brute $dE6B")
        assert(dE6 >= 0L && dE6 <= 1000000L)
        checked += 1
      } else assert(!res.contains(ty), s"$ty with an empty half must be excluded")
    }
    assert(checked > 0 && res.size == checked, "every oracled type re-derived")
  }

  test("stats_corr_matrix: cov_n2 matches a BigInt moment re-derivation exactly; r2_e6/r_sign track brute r") {
    val rows = Tables.lineitem(s, d)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax").collect()
      .map(r => Array(r.getDouble(0).toLong, cents(r.getDouble(1)),
        cents(r.getDouble(2)), cents(r.getDouble(3))))
    val n = BigInt(rows.length)
    def sSum(i: Int) = rows.map(r => BigInt(r(i))).sum
    def qSum(i: Int, j: Int) = rows.map(r => BigInt(r(i)) * r(j)).sum
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val res = SparkEntry.queries("stats_corr_matrix")(s, d).collect()
    assert(res.length == 6, "4 columns -> 6 pairs")
    res.foreach { r =>
      val (cx, cy) = (r.getString(0), r.getString(1))
      val (i, j) = (names.indexOf(cx), names.indexOf(cy))
      assert(i >= 0 && j > i, s"pair ($cx,$cy) ordering")
      assert(r.getLong(2) == rows.length)
      val cov = n * qSum(i, j) - sSum(i) * sSum(j)
      assert(r.getLong(3) == m9(cov), s"($cx,$cy) cov_m9")
      val dx = n * qSum(i, i) - sSum(i) * sSum(i)
      val dy = n * qSum(j, j) - sSum(j) * sSum(j)
      // integer surface: r2_e6 ≈ floor(1e6·r²) (shift truncation ≤ 1e-10
      // relative, so a 2e-6 absolute window is generous), sign exact
      val r2Brute = cov.toDouble * cov.toDouble / (dx.toDouble * dy.toDouble)
      val r2e6 = r.getLong(4)
      assert(math.abs(r2e6 / 1e6 - r2Brute) <= 2e-6, s"($cx,$cy): r2_e6 $r2e6 vs brute $r2Brute")
      assert(r2e6 >= 0L && r2e6 <= 1000000L)
      assert(r.getInt(5) == cov.signum, s"($cx,$cy) r_sign")
    }
  }

  test("stats_spearman: cov_n2 matches a sorted-rank BigInt re-derivation; rank sums are n(n+1)") {
    val rows = Tables.lineitem(s, d).select("l_returnflag", "l_quantity", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getDouble(1).toLong, cents(r.getDouble(2))))
    val res = SparkEntry.queries("stats_spearman")(s, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    val byFlag = rows.groupBy(_._1)
    // fixture flags all have varying quantity AND price, so none is
    // excluded by the degenerate-variance guard
    assert(res.keySet == byFlag.keySet)
    byFlag.foreach { case (flag, grp) =>
      // doubled average rank re-derived by direct position counting:
      // 2·avgrank(v) = #{u < v} + #{u <= v} + 1 — no windows, no sorting tricks
      def ranks2(vs: Array[Long]): Array[Long] =
        vs.map(v => vs.count(_ < v).toLong + vs.count(_ <= v) + 1)
      val xs = grp.map(_._2)
      val ys = grp.map(_._3)
      val rx = ranks2(xs)
      val ry = ranks2(ys)
      val n = BigInt(grp.length)
      // doubled ranks sum to exactly n(n+1) — the tie-handling invariant
      assert(rx.map(BigInt(_)).sum == n * (n + 1), s"$flag rx sum")
      assert(ry.map(BigInt(_)).sum == n * (n + 1), s"$flag ry sum")
      val sxy = rx.zip(ry).map { case (a, b) => BigInt(a) * b }.sum
      val cov = n * sxy - rx.map(BigInt(_)).sum * ry.map(BigInt(_)).sum
      val (rn, rcov, rho2e6, rsign) = res(flag)
      assert(rn == grp.length, s"$flag n")
      assert(rcov == m9(cov), s"$flag cov_m9 $rcov vs brute ${m9(cov)}")
      val dx = n * rx.map(a => BigInt(a) * a).sum - rx.map(BigInt(_)).sum.pow(2)
      val dy = n * ry.map(a => BigInt(a) * a).sum - ry.map(BigInt(_)).sum.pow(2)
      val rho2Brute = cov.toDouble * cov.toDouble / (dx.toDouble * dy.toDouble)
      assert(math.abs(rho2e6 / 1e6 - rho2Brute) <= 2e-6, s"$flag rho2_e6 $rho2e6 vs $rho2Brute")
      assert(rho2e6 >= 0L && rho2e6 <= 1000000L)
      assert(rsign == cov.signum, s"$flag rho_sign")
    }
  }

  test("events_autocorr: moments match a brute adjacent-day pair scan") {
    val evs = Tables.events(s, d).select(col("event_type"),
        expr("cast(ts_us div 86400000000 as bigint)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val res = SparkEntry.queries("events_autocorr")(s, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    var checked = 0
    evs.groupBy(_._1).foreach { case (ty, rows) =>
      val daily = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val pairs = daily.keys.toSeq.sorted.flatMap(day =>
        daily.get(day - 1).map(prev => (daily(day), prev)))
      val n = BigInt(pairs.length)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val dx = n * pairs.map(p => BigInt(p._1) * p._1).sum - sx * sx
      val dy = n * pairs.map(p => BigInt(p._2) * p._2).sum - sy * sy
      if (pairs.length >= 2 && dx > 0 && dy > 0) {
        val cov = n * pairs.map(p => BigInt(p._1) * p._2).sum - sx * sy
        val (rn, rcov, ac2e6, acSign) = res(ty)
        assert(rn == pairs.length, s"$ty n")
        assert(rcov == m9(cov), s"$ty cov_m9 $rcov vs ${m9(cov)}")
        val ac2Brute = cov.toDouble * cov.toDouble / (dx.toDouble * dy.toDouble)
        assert(math.abs(ac2e6 / 1e6 - ac2Brute) <= 2e-6, s"$ty ac12_e6 $ac2e6 vs $ac2Brute")
        assert(ac2e6 >= 0L && ac2e6 <= 1000000L)
        assert(acSign == cov.signum, s"$ty ac1_sign")
        checked += 1
      } else assert(!res.contains(ty), s"$ty degenerate (pairs/variance) must be excluded")
    }
    assert(checked > 0 && res.size == checked)
  }

  test("stats_mannwhitney: U2 matches a direct cross-half pairwise count") {
    val evs = Tables.events(s, d).select(col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"),
        expr("cast(ts_us div 86400000000 as bigint)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val m = (evs.map(_._3).min + evs.map(_._3).max + 1) / 2
    val res = SparkEntry.queries("stats_mannwhitney")(s, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    var checked = 0
    evs.groupBy(_._1).foreach { case (ty, rows) =>
      val h1 = rows.filter(_._3 < m).map(_._2)
      val h2 = rows.filter(_._3 >= m).map(_._2)
      if (h1.nonEmpty && h2.nonEmpty) {
        // doubled U by literal pairwise comparison: 2 per win, 1 per tie
        val u2 = (for (a <- h1; b <- h2) yield
          (if (a > b) 2L else if (a == b) 1L else 0L)).sum
        val (rn1, rn2, ru2, aucE6) = res(ty)
        assert(rn1 == h1.length && rn2 == h2.length, s"$ty half sizes")
        assert(ru2 == u2, s"$ty u2 $ru2 vs brute $u2")
        val aucE6B = ((BigInt(1000000) * u2) /
          (BigInt(2) * h1.length * h2.length)).toLong
        assert(aucE6 == aucE6B, s"$ty auc_e6 $aucE6 vs $aucE6B")
        assert(aucE6 >= 0L && aucE6 <= 1000000L)
        checked += 1
      } else assert(!res.contains(ty), s"$ty with an empty half must be excluded")
    }
    assert(checked > 0 && res.size == checked)
  }

  test("stats_anova: moments and snapped SSB match a BigInt re-derivation; F agrees with the rational value") {
    val evs = Tables.events(s, d).select(col("event_type"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("vc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val res = SparkEntry.queries("stats_anova")(s, d).collect()
    assert(res.length == 1)
    val row = res.head
    val groups = evs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = BigInt(groups.size)
    val n = BigInt(evs.length)
    val sAll = evs.map(e => BigInt(e._2)).sum
    val ssAll = evs.map(e => BigInt(e._2) * e._2).sum
    val sstN = n * ssAll - sAll * sAll
    // snapped per-group SSB term replicated with the engines' EXACT double
    // shape: one nearest-rounding of each exact integer, one division
    val ssb = groups.values.map { vs =>
      val ng = BigInt(vs.length)
      val sg = vs.map(BigInt(_)).sum
      val num = (sg * n - sAll * ng).pow(2)
      math.floor(num.toDouble / (ng.toDouble * n.toDouble * n.toDouble) + 0.5).toLong
    }.sum
    assert(row.getLong(0) == k.toLong && row.getLong(1) == n.toLong)
    assert(row.getLong(2) == m9(sstN), "sst_m9")
    assert(row.getLong(3) == ssb, s"ssb_c2 ${row.getLong(3)} vs brute $ssb")
    // integer-surface cross-check: the division-free operands through the
    // shared ratE6b replica — must be EXACT
    val ssbB = BigInt(ssb)
    val sswE = (sstN - n * ssbB).max(1)
    val fE6 = ratE6b(ssbB * (n - k) * n, sswE * (k - 1))
    val etaE6 = ratE6b(ssbB * n, sstN)
    assert(row.getLong(4) == fE6, s"f_e6 ${row.getLong(4)} vs brute $fE6")
    assert(row.getLong(5) == etaE6, s"eta2_e6 ${row.getLong(5)} vs brute $etaE6")
    // and the rational values they encode agree with the exact-double F/eta²
    val ssbExact = groups.values.map { vs =>
      val ng = BigInt(vs.length)
      val sg = vs.map(BigInt(_)).sum
      (sg * n - sAll * ng).pow(2).toDouble / (ng.toDouble * n.toDouble * n.toDouble)
    }.sum
    val sst = sstN.toDouble / n.toDouble
    assert(math.abs(etaE6 / 1e6 - ssbExact / sst) < 1e-4, "eta2_e6 vs rational")
    val fExact = (ssbExact / (k.toDouble - 1)) / ((sst - ssbExact) / (n.toDouble - k.toDouble))
    assert(fE6 > 0 && math.abs(fE6 / 1e6 - fExact) / fExact < 1e-3, "f_e6 vs rational")
    assert(etaE6 >= 0L && etaE6 <= 1000000L)
  }

  test("events_cusum: peak, arg-day, and totals match a brute prefix-sum scan; last prefix is zero") {
    val evs = Tables.events(s, d).select(col("event_type"),
        expr("cast(ts_us div 86400000000 as bigint)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val res = SparkEntry.queries("events_cusum")(s, d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    var checked = 0
    evs.groupBy(_._1).foreach { case (ty, rows) =>
      val daily = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val days = daily.keys.toSeq.sorted
      if (days.length >= 2) {
        val t = daily.values.sum
        val n = days.length.toLong
        var f = 0L
        val cus = days.zipWithIndex.map { case (day, idx) =>
          f += daily(day); (day, math.abs(n * f - (idx + 1) * t))
        }
        // the mean-centered walk returns to zero at the last day by
        // construction — the peak is an interior excursion
        assert(cus.last._2 == 0L, s"$ty terminal cusum")
        val amax = cus.map(_._2).max
        val cpDay = cus.filter(_._2 == amax).map(_._1).min
        val (rn, rt, rday, rcus, fracE6) = res(ty)
        assert(rn == n && rt == t, s"$ty totals")
        assert(rcus == amax, s"$ty peak $rcus vs brute $amax")
        assert(rday == cpDay, s"$ty cp_day $rday vs brute $cpDay")
        val fracE6B = ((BigInt(1000000) * amax) / (BigInt(n) * t)).toLong
        assert(fracE6 == fracE6B, s"$ty frac_e6 $fracE6 vs $fracE6B")
        assert(fracE6 >= 0L && fracE6 <= 1000000L)
        checked += 1
      } else assert(!res.contains(ty), s"$ty single-day series must be excluded")
    }
    assert(checked > 0 && res.size == checked)
  }

  test("stats_mutual_info: snapped cell sum matches a BigInt re-derivation; MI within entropy bounds") {
    val rows = Tables.customer(s, d).select("c_mktsegment", "c_nationkey")
      .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue))
    val res = SparkEntry.queries("stats_mutual_info")(s, d).collect()
    assert(res.length == 1)
    val row = res.head
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    // replicate the engines' exact shape: int64 products, one IEEE
    // division, one ln, floor(x+0.5) snap — then the sum is exact
    val smi = cells.map { case ((seg, nat), o) =>
      o * math.floor(math.log((o * n).toDouble / (rt(seg) * ct(nat)).toDouble)
        * 1e6 + 0.5).toLong
    }.sum
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == rt.size && row.getLong(2) == ct.size)
    assert(row.getLong(3) == smi, s"smi_e6 ${row.getLong(3)} vs brute $smi")
    // rational MI (no snapping) must agree within the snapping error and
    // respect 0 ≤ MI ≤ min(H(seg), H(nat))
    val miBrute = cells.map { case ((seg, nat), o) =>
      (o.toDouble / n) * math.log(o.toDouble * n / (rt(seg).toDouble * ct(nat)))
    }.sum
    val mi = row.getDouble(4)
    assert(math.abs(mi - miBrute) < 1e-4, s"mi $mi vs rational $miBrute")
    def entropy(m: Map[_, Long]) =
      -m.values.map(c => (c.toDouble / n) * math.log(c.toDouble / n)).sum
    assert(mi >= -1e-6 && mi <= math.min(entropy(rt), entropy(ct)) + 1e-6)
  }

  test("stats_theil_u: digests and u_e6 match a BigInt re-derivation; U within [0,1]") {
    val rows = Tables.customer(s, d).select("c_mktsegment", "c_nationkey")
      .collect().map(r => (r.getString(0), r.getAs[Number](1).longValue))
    val res = SparkEntry.queries("stats_theil_u")(s, d).collect()
    assert(res.length == 1)
    val row = res.head
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val smi = cells.map { case ((seg, nat), o) =>
      BigInt(o) * math.floor(math.log((o * n).toDouble / (rt(seg) * ct(nat)).toDouble)
        * 1e6 + 0.5).toLong
    }.sum
    val hn = -ct.values.map(c =>
      BigInt(c) * math.floor(math.log(c.toDouble / n.toDouble) * 1e6 + 0.5).toLong).sum
    val uE6 = smi.signum * ratE6b(smi.abs, hn.max(1))
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == rt.size && row.getLong(2) == ct.size)
    assert(row.getLong(3) == m9(smi), s"smi_m9 ${row.getLong(3)} vs ${m9(smi)}")
    assert(row.getLong(4) == m9(hn), s"hn_m9 ${row.getLong(4)} vs ${m9(hn)}")
    assert(row.getLong(5) == uE6, s"u_e6 ${row.getLong(5)} vs brute $uE6")
    // U is normalized: 0 ≤ MI/H(nat) ≤ 1 (snap slack at the edges)
    assert(row.getLong(5) >= -5L && row.getLong(5) <= 1000005L)
  }

  test("stats_benford: digit counts match a string-head recount; shares sum to one") {
    val prices = Tables.lineitem(s, d).select("l_extendedprice")
      .collect().map(_.getDouble(0)).filter(_ > 0)
    val truth = prices
      .map(p => math.floor(p * 100 + 0.5).toLong.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val res = SparkEntry.queries("stats_benford")(s, d).collect()
    val n = prices.length.toLong
    assert(res.map(_.getLong(0)).toSet == truth.keySet)
    assert(res.forall(r => r.getLong(0) >= 1 && r.getLong(0) <= 9))
    res.foreach { r =>
      val d0 = r.getLong(0)
      assert(r.getLong(1) == truth(d0), s"digit $d0 count")
      assert(r.getLong(2) == n)
      val benfordE6 = math.floor(math.log(1.0 + 1.0 / d0) / math.log(10.0) * 1e6 + 0.5).toLong
      assert(r.getLong(4) == benfordE6, s"digit $d0 benford_e6")
      val shareE6 = ((BigInt(1000000) * truth(d0)) / n).toLong
      assert(r.getLong(3) == shareE6, s"digit $d0 share_e6")
      assert(r.getLong(5) == shareE6 - benfordE6, s"digit $d0 diff_e6")
    }
    val shareSum = res.map(_.getLong(3)).sum
    assert(shareSum > 1000000L - 10 && shareSum <= 1000000L, "shares must sum to ~1")
  }

  test("stats_benford_chisq: chi-square matches a brute snapped-cell recount") {
    val prices = Tables.lineitem(s, d).select("l_extendedprice")
      .collect().map(_.getDouble(0)).filter(_ > 0)
    val truth = prices
      .map(p => math.floor(p * 100 + 0.5).toLong.toString.head.asDigit.toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = prices.length.toLong
    // exact-rational cells over the nine snapped benford_e6 constants,
    // through the shared ratE6b ladder — no data-dependent double anywhere
    val chi2e6 = truth.map { case (d0, o) =>
      val be6 = BigInt(math.floor(
        math.log(1.0 + 1.0 / d0) / math.log(10.0) * 1e6 + 0.5).toLong)
      val dev = BigInt(1000000) * o - BigInt(n) * be6
      ratE6b(dev * dev, BigInt(1000000) * n * be6)
    }.sum
    val r = SparkEntry.queries("stats_benford_chisq")(s, d).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == n && r(0).getLong(1) == truth.size.toLong)
    assert(r(0).getLong(2) == chi2e6, s"chi2_e6 ${r(0).getLong(2)} vs brute $chi2e6")
    // the uniform-ish synthetic prices are decidedly NOT Benford: the
    // statistic must be enormous relative to the df=8 critical value
    assert(r(0).getLong(2) / 1e6 > 100.0, "fixture should reject Benford loudly")
  }

  test("events_interarrival: gaps, quartiles, and totals match a brute sorted scan per (type, day)") {
    val evs = Tables.events(s, d).select(col("event_type"), col("ts_us"),
        expr("cast(ts_us div 86400000000 as bigint)").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val res = SparkEntry.queries("events_interarrival")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    var checked = 0
    evs.groupBy(_._1).foreach { case (ty, rows) =>
      // gap multiset from per-(day) SORTED timestamps — tie-break-free by
      // construction (sorted-multiset adjacency)
      val gaps = rows.groupBy(_._3).values.toSeq.flatMap { dayRows =>
        val ts = dayRows.map(_._2).sorted
        ts.zip(ts.drop(1)).map { case (a, b) => b - a }
      }.sorted
      if (gaps.nonEmpty) {
        val n = gaps.length.toLong
        def lowerQ(num: Long, den: Long): Long =
          gaps((((num * n + den - 1) / den) - 1).toInt) // min g: den·cum ≥ num·n
        val (rn, rsum, rmin, rq25, rq50, rq75, rmax) = res(ty)
        assert(rn == n, s"$ty n_gaps")
        assert(rsum == gaps.sum, s"$ty gap sum")
        assert(rmin == gaps.head && rmax == gaps.last, s"$ty min/max")
        assert(rq25 == lowerQ(1, 4), s"$ty q25")
        assert(rq50 == lowerQ(1, 2), s"$ty q50")
        assert(rq75 == lowerQ(3, 4), s"$ty q75")
        assert(rq25 <= rq50 && rq50 <= rq75, s"$ty quartile order")
        checked += 1
      } else assert(!res.contains(ty), s"$ty with no gaps must be excluded")
    }
    assert(checked > 0 && res.size == checked)
  }

  test("CorrMatrix operator: exact ±1 on constructed colinear columns, k=3 pair count, name order") {
    import s.implicits._
    // y = 2x (r exactly 1), z = 100 - 3x (r exactly -1): the operator's
    // integer moments make these EXACT, not approximate
    val df = (1L to 200L).map(x => (x, 2 * x, 100 - 3 * x)).toDF("x", "y", "z")
    val res = graft.operators.CorrMatrix.of(df, Seq("x", "y", "z")).collect()
    assert(res.length == 3)
    val byPair = res.map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byPair.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    assert(byPair(("x", "y")).getLong(4) == 1000000L && byPair(("x", "y")).getInt(5) == 1)
    assert(byPair(("x", "z")).getLong(4) == 1000000L && byPair(("x", "z")).getInt(5) == -1)
    assert(byPair(("y", "z")).getLong(4) == 1000000L && byPair(("y", "z")).getInt(5) == -1)
    res.foreach(r => assert(r.getLong(2) == 200L))
    // cov_m9 against a BigInt brute on one pair: (n·Sxy − Sx·Sy) mod 1e9+7
    val xs = (1L to 200L).map(BigInt(_))
    val cov = BigInt(200) * xs.map(x => x * 2 * x).sum - xs.sum * xs.map(_ * 2).sum
    assert(byPair(("x", "y")).getLong(3) == m9(cov))
  }

  test("forecast_seasonal_naive: MAE terms match a brute day-7-aligned recount") {
    val counts = Tables.events(s, d)
      .select(col("event_type"), expr("cast(ts_us div 86400000000 as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val res = SparkEntry.queries("forecast_seasonal_naive")(s, d).collect()
      .map(r => r.getString(0) -> r).toMap
    val types = counts.keys.map(_._1).toSeq.distinct
    var checked = 0
    types.foreach { ty =>
      val days = counts.keys.filter(_._1 == ty).map(_._2)
      // pairs where BOTH day d and d-7 were observed — exact calendar
      // alignment, not observed-row lag
      val pairs = days.toSeq.filter(dd => counts.contains((ty, dd - 7)))
        .map(dd => (counts((ty, dd)), counts((ty, dd - 7))))
      if (pairs.nonEmpty) {
        val r = res(ty)
        assert(r.getLong(1) == pairs.length.toLong, s"$ty n_days")
        assert(r.getLong(2) == pairs.map(_._1).sum, s"$ty actual_sum")
        val absErrs = pairs.map { case (a, b) => math.abs(a - b) }
        assert(r.getLong(3) == absErrs.sum, s"$ty abs_err_sum")
        assert(r.getLong(4) == absErrs.max, s"$ty max_abs_err")
        val maeE6 = ((BigInt(1000000) * absErrs.sum) / pairs.length).toLong
        assert(r.getLong(5) == maeE6, s"$ty mae_e6 ${r.getLong(5)} vs $maeE6")
        checked += 1
      } else assert(!res.contains(ty), s"$ty without aligned days must be absent")
    }
    assert(checked > 0 && res.size == checked)
  }

  test("stats_kendall_tau: pair counts and tau-b match a brute O(n^2) loop") {
    val custNation = Tables.customer(s, d)
      .selectExpr("c_custkey", "cast(c_nationkey as bigint)")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perNation = Tables.orders(s, d).select("o_custkey", "o_totalprice")
      .collect().map(r => (custNation(r.getLong(0)), cents(r.getDouble(1))))
      .groupBy(_._1).view
      .mapValues(rows => (rows.length.toLong, rows.map(v => BigInt(v._2)).sum))
      .toMap
    val g = perNation.toSeq.sortBy(_._1).map { case (_, (x, y)) => (x, y) }
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L; var np = 0L
    for (i <- g.indices; j <- (i + 1) until g.length) {
      val ((ax, ay), (bx, yb)) = (g(i), g(j)); np += 1
      if ((ax < bx && ay < yb) || (ax > bx && ay > yb)) nc += 1
      else if ((ax < bx && ay > yb) || (ax > bx && ay < yb)) nd += 1
      if (ax == bx) tx += 1
      if (ay == yb) ty += 1
    }
    val r = SparkEntry.queries("stats_kendall_tau")(s, d).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == g.length.toLong, "n_groups")
    assert(r(0).getLong(1) == np, "n_pairs")
    assert(r(0).getLong(2) == nc, "nc")
    assert(r(0).getLong(3) == nd, "nd")
    assert(r(0).getLong(4) == tx, "tie_x")
    assert(r(0).getLong(5) == ty, "tie_y")
    val tau2 = ((nc - nd).toDouble * (nc - nd)) / ((np - tx).toDouble * (np - ty))
    assert(math.abs(r(0).getLong(6) / 1e6 - tau2) <= 2e-6, "tau2_e6")
    assert(r(0).getLong(6) >= 0L && r(0).getLong(6) <= 1000000L)
    assert(r(0).getInt(7) == (nc - nd).signum, "tau_sign")
  }

  test("bpe_pair_counts is the true top-50 of a brute-force pair recount") {
    val brute = Tables.documents(s, d).select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split(" "))
      .filter(_.length >= 2)
      .flatMap(t => t.sliding(2))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (p, c) => (-c, p) }
    val res = SparkEntry.queries("bpe_pair_counts")(s, d).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(res.length == 50 && res.forall(_._1.length == 2))
    assert(res.toSeq == brute.take(50).toSeq, "top-50 pairs diverge from brute force")
  }
}
