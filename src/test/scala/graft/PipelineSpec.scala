package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-9 Pipeline suite — each test re-derives
  * the op's property by an INDEPENDENT method (brute force, alternate
  * formulation, or invariant) rather than re-running the same plan.
  */
class PipelineSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterEach {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  override def afterEach(): Unit = { s.catalog.clearCache(); super.afterEach() }

  test("sessionize_gap_sweep: counts match a brute gap walk and the 1800s row equals sessionize") {
    import org.apache.spark.sql.functions._
    val evs = Tables.events(s, d).select("user_id", "event_id", "ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gapsByUser = evs.groupBy(_._1).view.mapValues(rows =>
      rows.sortBy(r => (r._3, r._2)).map(_._3).toSeq).toMap
    val res = SparkEntry.queries("sessionize_gap_sweep")(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(res.keySet == Set(60L, 300L, 900L, 1800L, 3600L))
    val nEvents = evs.length.toLong
    Seq(60L, 300L, 900L, 1800L, 3600L).foreach { gs =>
      val sessions = gapsByUser.values.map { ts =>
        1L + ts.zip(ts.drop(1)).count { case (a, b) => b - a > gs * 1000000L }
      }.sum
      val eps = (BigInt(1000000) * nEvents / sessions).toLong
      assert(res(gs) == ((sessions, nEvents, eps)), s"gap $gs: ${res(gs)}")
    }
    // monotone: a larger gap can only merge sessions
    val ordered = Seq(60L, 300L, 900L, 1800L, 3600L).map(res(_)._1)
    assert(ordered == ordered.sorted.reverse, s"session counts must be non-increasing: $ordered")
    // cross-key consistency: the 1800s row IS sessionize's session count
    val sess = SparkEntry.queries("sessionize")(s, d)
      .groupBy("user_id").agg(max("sess_seq").as("m"))
      .agg(sum("m")).collect()(0).getLong(0)
    assert(res(1800L)._1 == sess, s"gap-sweep 1800s ${res(1800L)._1} vs sessionize $sess")
  }

  test("pareto_frontier equals the brute-force O(n^2) dominance scan") {
    val res = SparkEntry.queries("pareto_frontier")(s, d)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    // independent derivation: p is dominated iff some q is <= on price,
    // >= on size, and strictly better on at least one
    val p = Tables.part(s, d)
      .select(col("p_partkey"), col("p_retailprice").as("pr"), col("p_size").as("sz"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = p.filter { case (_, pr, sz) =>
      !p.exists { case (_, qr, qz) =>
        qr <= pr && qz >= sz && (qr < pr || qz > sz)
      }
    }.map(_._1).toSet
    assert(res == brute, s"frontier mismatch: engine=$res brute=$brute")
    assert(res.nonEmpty)
  }

  test("join_bloom_prefilter is transparent: identical to the plain join, and planned pre-shuffle") {
    val withBloom = SparkEntry.queries("join_bloom_prefilter")(s, d)
    val plain = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 450000),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(expr(graft.queries.Sqlh.dsum(graft.queries.Sqlh.revenue)).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
    assert(withBloom.collect().toSeq == plain.collect().toSeq)
    // the bloom probe must sit in the fact branch BELOW the sort-merge
    // join: find it as a Filter condition, and confirm the join regime
    val plan = withBloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom probe missing from the physical plan")
    assert(plan.contains("SortMergeJoin"), "MERGE hint did not pin the shuffle-join regime")
  }

  test("bloom_agg 2-arg SQL form coerces an INT-literal estimate and has no false negatives") {
    graft.functions.Blooms.register(s)
    Tables.orders(s, d).select(col("o_orderkey").as("k")).limit(100)
      .createOrReplaceTempView("bl_keys")
    // 1000000 parses as an INT literal; BloomFilterAggregate demands a
    // foldable LongType estimate, so this analyzes only because aggBuilder
    // injects the cast — the regression under test
    val hits = s.sql(
      """SELECT k, bloom_might_contain(
        |  (SELECT bloom_agg(k, 1000000) FROM bl_keys), k) AS hit
        |FROM bl_keys""".stripMargin).collect()
    assert(hits.length == 100)
    assert(hits.forall(_.getBoolean(1)), "bloom filter returned a false negative")
  }

  test("dedup_containment >= jaccard on every shared pair, and catches the planted containment") {
    val cont = SparkEntry.queries("dedup_containment")(s, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    s.catalog.clearCache()
    val jac = SparkEntry.queries("dedup_ngram_jaccard")(s, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2) / 1000.0)).toMap
    // containment's denominator min(|A|,|B|) <= Jaccard's |A∪B|, so every
    // jac >= 0.5 pair must reappear with containment >= its jaccard — the
    // two ops ran through different aggregation paths, so this is a real
    // cross-check, not a tautology
    val joined = jac.keySet.intersect(cont.keySet)
    assert(joined.nonEmpty, "no overlap between jaccard and containment pair sets")
    joined.foreach { k =>
      // jac carries the e3 snap (±5e-4); containment is the exact ratio
      assert(cont(k) >= jac(k) - 5.0001e-4, s"containment < jaccard for $k")
    }
    // every high-jaccard pair is by definition containment >= jaccard >= 0.8
    jac.filter(_._2 >= 0.8).keys.foreach { k =>
      assert(cont.contains(k), s"pair $k has jac >= 0.8 but no containment row")
    }
    cont.values.foreach(c => assert(c >= 0.8 && c <= 1.0 + 1e-12))
  }

  test("dedup_rate_by_source: counts match a brute recount from the pair list") {
    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(s, d)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
    s.catalog.clearCache()
    val dupDocs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val docs = Tables.documents(s, d).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val res = SparkEntry.queries("dedup_rate_by_source")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val bySrc = docs.groupBy(_._2)
    assert(res.keySet == bySrc.keySet, "every source reports, dup or not")
    bySrc.foreach { case (src, grp) =>
      val n = grp.length.toLong
      val nd = grp.count(dc => dupDocs.contains(dc._1)).toLong
      val rate = (BigInt(1000000) * nd / n).toLong
      assert(res(src) == ((n, nd, rate)), s"$src: ${res(src)} vs ($n,$nd,$rate)")
    }
    // non-vacuous: the fixture has organic near-dups somewhere
    assert(res.values.map(_._2).sum > 0, "no source shows any dups")
  }

  test("outlier_iqr rows are exactly the rows outside rank-derived fences") {
    val out = SparkEntry.queries("outlier_iqr")(s, d)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // independent fence derivation: sort each type's values locally
    val byType = Tables.events(s, d).select("event_id", "event_type", "value")
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(2)))
      .groupBy(_._1)
    val expected = byType.iterator.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val n = sorted.length
      val q1 = sorted((n + 3) / 4 - 1)._3
      val q3 = sorted((3 * n + 3) / 4 - 1)._3
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      rows.filter(r => r._3 < lo || r._3 > hi).map(_._2)
    }.toSet
    assert(out == expected)
    assert(out.nonEmpty, "fixture should produce IQR outliers (right-skewed values)")
  }

  test("dedup_chunk counts are consistent and every chunk truly spans >= 2 docs") {
    val res = SparkEntry.queries("dedup_chunk")(s, d).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      assert(r.getLong(2) >= 2, "n_docs < 2 leaked through the HAVING")
      assert(r.getLong(1) >= r.getLong(2), "n_occ < n_docs is impossible")
    }
    // spot-verify the top chunk by scanning the raw text independently
    val top = res.head.getString(0)
    val hits = Tables.documents(s, d)
      .filter(expr(s"contains(lower(text), '${top.replace("'", "\\'")}')"))
      .count()
    assert(hits >= 2, s"top chunk '$top' not found in >= 2 docs by raw scan")
  }

  test("quality_gate: kept is the gate conjunction and the gates discriminate") {
    val rows = SparkEntry.queries("quality_gate")(s, d).collect()
    assert(rows.length == Tables.documents(s, d).count())
    rows.foreach { r =>
      val (gl, gw, gs, gr, kept) =
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))
      assert(kept == (gl && gw && gs && gr))
    }
    val keptN = rows.count(_.getBoolean(5))
    assert(keptN > 0 && keptN < rows.length,
      s"gate does not discriminate: kept $keptN of ${rows.length}")
  }

  test("domain_mix keeps exactly min-lang-count docs per language, lowest ids first") {
    val res = SparkEntry.queries("domain_mix")(s, d)
    val perLang = res.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = Tables.documents(s, d).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mn = counts.values.min
    assert(perLang.values.toSet == Set(mn), s"per-lang kept counts $perLang != min $mn")
    // lowest-ids-first: the kept set per lang is the bottom-mn doc_ids
    val keptIds = res.select("doc_id", "lang").collect()
      .map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
    val allIds = Tables.documents(s, d).select("doc_id", "lang").collect()
      .map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
    keptIds.foreach { case (lang, kept) =>
      val expect = allIds(lang).map(_._2).sorted.take(mn.toInt).toSet
      assert(kept.map(_._2).toSet == expect, s"$lang kept set is not the lowest ids")
    }
  }

  test("histogram_fixed partitions the data: counts sum to total, min/max inside bin bounds") {
    val res = SparkEntry.queries("histogram_fixed")(s, d).collect()
    val total = Tables.events(s, d).count()
    assert(res.map(_.getLong(2)).sum == total)
    res.foreach { r =>
      val (bin, vmin, vmax) = (r.getInt(1), r.getDouble(3), r.getDouble(4))
      assert(vmin >= bin * 25.0 && vmax < (bin + 1) * 25.0 && vmin <= vmax)
    }
  }

  test("sessionize: session boundaries are exactly the >30min gaps, numbering is dense") {
    val res = SparkEntry.queries("sessionize")(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byEvent = res.map(r => r._1 -> r._3).toMap
    // independent re-derivation from the raw events
    val raw = Tables.events(s, d).select("user_id", "event_id", "ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    raw.foreach { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      var seq = 0L
      var prev = Long.MinValue
      sorted.foreach { case (_, eid, ts) =>
        if (prev == Long.MinValue || ts - prev > 1800000000L) seq += 1
        assert(byEvent(eid) == seq, s"event $eid: sess_seq ${byEvent(eid)} != $seq")
        prev = ts
      }
      assert(seq >= 1)
    }
    assert(res.length == raw.valuesIterator.map(_.length).sum)
  }

  test("topk_diverse: <= 3 per lang, <= 2 per (lang, source), and no longer doc was skippable") {
    val res = SparkEntry.queries("topk_diverse")(s, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val perLang = res.groupBy(_._1)
    perLang.foreach { case (lang, rows) =>
      assert(rows.length <= 3, s"$lang has ${rows.length} > 3 rows")
      rows.groupBy(_._2).foreach { case (src, g) =>
        assert(g.length <= 2, s"($lang,$src) has ${g.length} > 2 rows")
      }
    }
    // exchange argument: any doc longer than a kept doc must be excluded
    // only by the source cap (its source already contributes 2 longer docs)
    val all = Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // rank proxy: higher n_chars wins, doc_id breaks ties ascending
    def beats(x: (Long, Long), y: (Long, Long)): Boolean = // (n_chars, doc_id)
      x._1 > y._1 || (x._1 == y._1 && x._2 < y._2)
    perLang.foreach { case (lang, kept) =>
      val keptIds = kept.map(_._3).toSet
      val minKept = kept.map(r => (r._4, r._3)).minBy(r => (r._1, -r._2))
      all.filter(a => a._2 == lang && !keptIds.contains(a._1))
        .filter(a => beats((a._4, a._1), minKept))
        .foreach { a =>
          val longerSameSource = all.count(b => b._2 == lang && b._3 == a._3 &&
            keptIds.contains(b._1) && beats((b._4, b._1), (a._4, a._1)))
          assert(longerSameSource >= 2,
            s"doc ${a._1} ($lang/${a._3}) was skipped without a full source quota above it")
        }
    }
  }

  test("agg_mode picks the max-count value with the smallest-value tie-break") {
    val res = SparkEntry.queries("agg_mode")(s, d)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val counts = Tables.lineitem(s, d).select("l_returnflag", "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val flags = counts.keys.map(_._1).toSet
    assert(res.map(_._1).toSet == flags)
    res.foreach { case (flag, qty, cnt) =>
      assert(counts((flag, qty)) == cnt)
      val better = counts.filter { case ((f, q), c) =>
        f == flag && (c > cnt || (c == cnt && q < qty))
      }
      assert(better.isEmpty, s"$flag: $better beats reported mode ($qty, $cnt)")
    }
  }

  test("stats_regression agrees with double-precision corr/OLS within float tolerance") {
    val res = SparkEntry.queries("stats_regression")(s, d)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // independent re-derivation with plain double accumulation (different
    // arithmetic path — agreement within tolerance, not bit equality)
    val rows = Tables.lineitem(s, d).select("l_returnflag", "l_quantity", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { case (flag, g) =>
      val n = g.length.toDouble
      val xs = g.map(_._2); val ys = g.map(_._3)
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      val sxy = g.map(r => r._2 * r._3).sum
      val corr = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val (c, sl, ic) = res(flag)
      assert(math.abs(c - corr) < 1e-6, s"$flag corr $c vs $corr")
      assert(math.abs(sl - slope) < 1e-6, s"$flag slope $sl vs $slope")
      assert(math.abs(ic - intercept) < 1e-3, s"$flag intercept $ic vs $intercept")
    }
  }

  test("text_unigram_logprob: floor margins are safe and scores match a direct re-derivation") {
    // ln-parity guard (the text_tfidf discipline): every (lang, tok)
    // log-prob lands far from a floor boundary, so a 1-ulp JVM/DuckDB ln
    // divergence cannot flip the scaled integer
    val toks = Tables.documents(s, d)
      .select(col("lang"), explode(split(lower(col("text")), " ")).as("tok"))
    val freq = toks.groupBy("lang", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val tot = freq.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    freq.foreach { case ((lang, _), c) =>
      val x = math.log(c.toDouble / tot(lang)) * 1e6 + 0.5
      // ulp-based margin, the CurationSpec tfidf discipline: a 1-ulp
      // JVM/DuckDB ln divergence moves x by ~1 ulp, so >= 1000 ulps of
      // slack means the floored integer cannot flip
      val marginUlps = math.min(x - math.floor(x), math.ceil(x) - x) / math.ulp(x)
      assert(marginUlps > 1000, s"floor margin $marginUlps ulps for c=$c t=${tot(lang)}")
    }
    // independent re-derivation of the per-doc mean
    val res = SparkEntry.queries("text_unigram_logprob")(s, d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    docs.foreach { case (id, lang, text) =>
      val ts = text.toLowerCase.split(" ")
      val sum = ts.map { t =>
        math.floor(math.log(freq((lang, t)).toDouble / tot(lang)) * 1e6 + 0.5).toLong
      }.sum
      val (nTok, sumE6, avg) = res(id)
      assert(nTok == ts.length && sumE6 == sum, s"doc $id: ($nTok,$sumE6) != (${ts.length},$sum)")
      assert(math.abs(avg - sum.toDouble / (ts.length * 1e6)) < 1e-12)
      assert(avg < 0, "unigram log-probs must be negative")
    }
  }

  test("sessionize_typed is row-identical to the window sessionize") {
    val typed = SparkEntry.queries("sessionize_typed")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val window = SparkEntry.queries("sessionize")(s, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(typed == window, "typed secondary-sort path diverges from the window path")
    assert(typed.nonEmpty)
  }

  test("session_stats agrees with stats computed off the sessionize assignment") {
    val sess = SparkEntry.queries("sessionize")(s, d).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (user_id, sess_seq)
    val res = SparkEntry.queries("session_stats")(s, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    sess.groupBy(_._1).foreach { case (uid, grp) =>
      val perSess = grp.groupBy(_._2).view.mapValues(_.length).values.toSeq
      val (n, mean, bounce) = res(uid)
      assert(n == perSess.length)
      assert(mean == grp.length.toDouble / perSess.length)
      assert(bounce == perSess.count(_ == 1).toDouble / perSess.length)
      assert(mean >= 1.0 && bounce >= 0.0 && bounce <= 1.0)
    }
    assert(res.size == sess.map(_._1).distinct.length)
  }

  test("profile_columns one-pass stats match per-column direct aggregation") {
    val res = SparkEntry.queries("profile_columns")(s, d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val li = Tables.lineitem(s, d)
    val n = li.count()
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")) {
      val direct = li.agg(countDistinct(col(c)).as("nd"), min(c).as("mn"), max(c).as("mx"))
        .collect().head
      assert(res(c) == ((n, direct.getLong(0), direct.getDouble(1), direct.getDouble(2))),
        s"profile mismatch for $c")
    }
  }
}
