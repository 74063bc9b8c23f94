package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2 — golden tests at sf0.001. Expected values were computed
  * INDEPENDENTLY with DuckDB 1.0.0 on the same parquet (not by running the
  * engine), so these catch engine regressions without DuckDB in the loop.
  */
class GoldenSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterEach {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  private def run(key: String) = SparkEntry.queries(key)(s, d)
  // dedup queries cache intermediates by contract; don't let them
  // accumulate across tests in the shared session
  override def afterEach(): Unit = { s.catalog.clearCache(); super.afterEach() }

  test("entry / flagship: 15 region x flag groups, exact first row") {
    val rows = SparkEntry.entry(s).collect()
    assert(rows.length == 15)
    val first = rows.head
    assert(first.getString(0) == "AFRICA" && first.getString(1) == "A")
    assert(first.getDouble(2) == 2865201.8026)
    assert(first.getLong(3) == 57L)
  }

  test("agg_hash_sum: 6 groups; (A,F) qty 24851 over 977 items") {
    val m = run("agg_hash_sum").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(9))).toMap
    assert(m.size == 6)
    assert(m(("A", "F")) == (24851.0, 977L))
    assert(m(("R", "O")) == (25633.0, 1001L))
  }

  test("join cardinalities: semi 150, anti 7, cross 125") {
    assert(run("join_semi").count() == 150L)
    // anti-join vs the l_quantity > 45 lineitem subset is NON-vacuous:
    // 7 of 200 parts at sf0.001 are never ordered in bulk
    assert(run("join_anti").count() == 7L)
    assert(run("join_cross").count() == 125L)
  }

  test("join_null_safe: NULL bucket row survives the join; counts match a brute recount") {
    import org.apache.spark.sql.functions.{col, expr}
    val evs = Tables.events(s, d)
      .filter(col("event_type").isin("click", "view"))
      .select(expr("nullif(cast(get_json_object(props, '$.k') as bigint)" +
        " div 10, 0)").as("bucket"), col("event_type"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1)))
    val clicks = evs.filter(_._2 == "click").groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    val views = evs.filter(_._2 == "view").groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    val res = SparkEntry.queries("join_null_safe")(s, d).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // a PLAIN equi-join would drop exactly the None key — the null-safe
    // variant must keep it
    assert(res.contains(None), "NULL bucket must survive the null-safe join")
    assert(res.keySet == clicks.keySet.intersect(views.keySet))
    res.foreach { case (k, (c, v, ratioE6)) =>
      assert(c == clicks(k) && v == views(k), s"bucket $k counts")
      assert(ratioE6 == (BigInt(1000000) * c / v).toLong, s"bucket $k ratio_e6")
    }
  }

  test("generators: sequence 12 rows, grid 231 rows each summing to 100") {
    assert(run("gen_sequence").count() == 12L)
    val grid = run("gen_grid").collect()
    assert(grid.length == 231)
    assert(grid.forall(r => r.getInt(0) + r.getInt(1) + r.getInt(2) == 100))
  }

  test("stream_session: 946 sessions over 15 users at sf0.001") {
    val sess = run("stream_session").collect()
    assert(sess.length == 946)
    assert(sess.map(_.getLong(0)).distinct.length == 15)
  }

  test("join_asof: one row per event; exactly one null match per user") {
    val rows = run("join_asof").collect()
    assert(rows.length == 1000)
    // the first event of each user has no earlier event
    assert(rows.count(_.isNullAt(1)) == 15)
  }

  test("dedup_cluster: pair endpoints co-cluster; one rep per cluster") {
    val clusters = run("dedup_cluster").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getBoolean(3))).toMap
    // every doc appears exactly once
    assert(clusters.size == Tables.documents(s, d).count())
    // each jaccard pair's endpoints must share a cluster id
    run("dedup_ngram_jaccard").collect().foreach { r =>
      val (da, db) = (r.getLong(0), r.getLong(1))
      assert(clusters(da)._1 == clusters(db)._1, s"pair ($da,$db) split across clusters")
    }
    // exactly one representative per cluster, and it is the min doc_id
    val byCluster = clusters.groupBy(_._2._1)
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_._2._3) == 1, s"cluster $cid rep count != 1")
      assert(members.keys.min == cid, s"cluster $cid id is not the min member")
      members.foreach { case (_, (_, size, _)) => assert(size == members.size) }
    }
  }

  test("dedup_fuzzy: deterministic 500 identity pairs + bounded organic pairs") {
    // deterministic integer minhashes (r12: cross-engine mixes, also
    // hash-exact oracled) — reproducible run to run. Pin the exact
    // invariants (every doc self-pairs at dist 0) but only BOUND the
    // organic near-dup count: an exact pin (528 total in round 6) couples
    // the test to fixture bytes AND band layout with no diagnostic.
    val rows = run("dedup_fuzzy").collect()
    val identity = rows.filter(r => r.getLong(0) == r.getLong(1))
    assert(identity.length == 500, s"got ${identity.length} identity pairs")
    assert(identity.forall(_.getLong(2) == 0L), "identity pairs must have dist 0")
    val organic = rows.length - identity.length
    assert(organic >= 15 && organic <= 60,
      s"organic near-dup pair count $organic outside the plausible band [15, 60]")
  }

  test("dedup_calibration: exact Jaccard matches a string-shingle re-derivation; estimator arithmetic consistent") {
    // hash-free twin: per doc the DISTINCT 3-word shingle set as STRINGS
    // (the GoldenSpec string-twin discipline — no polyhash anywhere), so
    // a gram-hash collision in the engine would surface here as a j3 or
    // n_common mismatch
    val shingles: Map[Long, Set[String]] = Tables.documents(s, d)
      .select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).toLowerCase.split(" ")
        r.getLong(0) -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
    val rows = run("dedup_calibration").collect()
    assert(rows.nonEmpty, "banded candidates must exist at sf0.001")
    rows.foreach { r =>
      val (da, db) = (r.getLong(0), r.getLong(1))
      assert(da < db, s"calibration pairs must be strict: ($da,$db)")
      val (nc, est) = (r.getLong(2), r.getLong(3))
      val (estE3, jE3, errE3) = (r.getLong(4), r.getLong(5), r.getLong(6))
      val (sa, sb) = (shingles(da), shingles(db))
      val c = (sa & sb).size.toLong
      assert(nc == c, s"($da,$db): n_common=$nc but string-shingle intersection=$c")
      // exact integer twins of the e3 surfaces (floor division)
      val jE3B = (BigInt(1000) * c / (sa.size + sb.size - c)).toLong
      assert(jE3 == jE3B, s"($da,$db): j_e3=$jE3 vs brute $jE3B")
      assert(est >= 0 && est <= queries.TextSim.MinhashK, s"est_match=$est out of range")
      assert(estE3 == 1000L * est / queries.TextSim.MinhashK, s"($da,$db) est_e3")
      assert(errE3 == estE3 - jE3B, s"($da,$db) err_e3")
    }
    // the candidate set must cover every organic confirmed near-dup pair:
    // dedup_fuzzy's da<db rows came through the SAME guarded band join
    val calPairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    run("dedup_fuzzy").collect()
      .filter(r => r.getLong(0) != r.getLong(1))
      .foreach { p =>
        val pr = (p.getLong(0), p.getLong(1))
        assert(calPairs.contains(pr), s"confirmed near-dup $pr missing from calibration")
      }
  }

  test("agg_approx_distinct: HLL estimate within 5% of exact") {
    // the query now emits both the sketch and the exact count — assert
    // the ±5% invariant directly on the query's own output
    val rows = run("agg_approx_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      val a = r.getLong(1).toDouble
      val n = r.getLong(2).toDouble
      assert(math.abs(a - n) / n <= 0.05, s"$flag: approx $a vs exact $n")
    }
  }

  test("window_rank handles ties: rank repeats, row_number stays unique") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import s.implicits._
    // planted tie: two rows share the ordering value
    val df = Seq((1, 10.0), (2, 10.0), (3, 5.0)).toDF("id", "v")
    val ties = Window.orderBy(col("v").desc)
    val total = Window.orderBy(col("v").desc, col("id"))
    val out = df.select(col("id"), rank().over(ties).as("rnk"),
      row_number().over(total).as("rn")).orderBy("id").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 1, 3))
    assert(out.map(_.getInt(2)).toSeq == Seq(1, 2, 3))
  }

  test("text_redact actually fires on the fixture (not a vacuous identity)") {
    import org.apache.spark.sql.functions.col
    val out = run("text_redact")
    assert(out.filter(col("n_ent") > 0).count() > 0,
      "blocklist pattern matched nothing — the oracle compare would pass vacuously")
    assert(out.filter(col("red_text").contains("<ENT>")).count() > 0)
    assert(out.filter(col("red_text").contains("customer")).count() == 0,
      "a blocklisted term survived redaction")
  }

  test("dedup_retention keeps exactly one doc per cluster, the longest") {
    import org.apache.spark.sql.functions._
    val out = run("dedup_retention").persist()
    val perCluster = out.groupBy("cluster_id")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("kept"),
        max("n_tok").as("max_tok"),
        max(when(col("keep"), col("n_tok"))).as("kept_tok"))
    assert(perCluster.filter(col("kept") =!= 1).count() == 0,
      "every cluster must retain exactly one member")
    assert(perCluster.filter(col("kept_tok") =!= col("max_tok")).count() == 0,
      "the retained member must be a longest one")
    // non-vacuous: the fixture has real multi-doc clusters to prune
    assert(out.filter(!col("keep")).count() > 0)
  }

  test("mm_frame_sample covers both regimes: capped at 32 and duration-bound") {
    import org.apache.spark.sql.functions._
    val out = run("mm_frame_sample")
    val perDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("frame_ts_ms").as("max_ts"))
    assert(perDoc.count() == 500L, "every doc must emit at least one frame")
    assert(perDoc.filter(col("n") > 32).count() == 0, "cap must hold")
    assert(perDoc.filter(col("n") === 32).count() > 0,
      "no doc hit the 32-frame cap — the cap branch is untested")
    assert(perDoc.filter(col("n") < 32).count() > 0,
      "no doc below the cap — the uniform-stride branch is untested")
    // a frame timestamp never reaches the duration (i < n ensures it for
    // dur > 0; a zero-duration item emits exactly frame 0 at ts 0).
    // Duration is UTF-8 BYTES (what the query uses), not char count —
    // they coincide on the ASCII fixture but the test must not bake the
    // wrong unit in.
    val dur = TestSpark.spark.read.parquet(s"$d/documents.parquet")
      .selectExpr("doc_id", "octet_length(encode(text, 'UTF-8')) as dur")
    assert(perDoc.join(dur, "doc_id")
      .filter(col("max_ts") >= greatest(col("dur"), lit(1))).count() == 0)
  }

  test("pack_sequences: packs are contiguous per shard and respect the running budget") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val out = run("pack_sequences")
    // within a shard, pack_id is non-decreasing in doc order and a doc's
    // pack equals floor(tokens-before / 512) — re-derive independently
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val re = out.withColumn("expect",
      floor(coalesce(sum("n_tok").over(w), lit(0L)) / 512).cast("int"))
    assert(re.filter(col("pack_id") =!= col("expect")).count() == 0)
    assert(out.select("pack_id").distinct().count() > 1, "must produce multiple packs")
  }

  test("events_funnel: 24h-window funnel decays 15 -> 6 -> 3 (DuckDB golden)") {
    val rows = run("events_funnel").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1, "view", 15L), (2, "click", 6L), (3, "purchase", 3L)))
  }

  test("text_repetition: e6 ratios in [0,1e6]; the ~40-word vocab makes word repetition pervasive") {
    val rows = run("text_repetition").collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val (w, b) = (r.getLong(2), r.getLong(3))
      w >= 0L && w <= 1000000L && b >= 0L && b <= 1000000L
    })
    // non-vacuous both ways: most docs repeat words, bigram repetition
    // exists but is rare. 430, not 431: doc 472's exact duplicate-word
    // rational is EXACTLY 3/10 (floor(1e6*3/10) = 300000, not > 300000) —
    // the integer surface makes the old double-rounding footnote moot
    assert(rows.count(_.getLong(2) > 300000L) == 430)
    assert(rows.exists(_.getLong(3) > 0L))
  }

  test("decontaminate: 7 flagged train docs incl. one strong near-dup of the benchmark") {
    val rows = run("decontaminate").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.length == 7)
    assert(rows.forall { case (id, nShared, nBench) =>
      id % 41 != 0 && nShared >= 1 && nBench >= 1
    }, "benchmark members must never flag themselves")
    // doc 428 is an organic near-duplicate of a benchmark doc: 37 shared
    // 4-grams — the signal the op exists to catch; the rest are 1-gram
    // incidental collisions from the small fixture vocabulary
    assert(rows.find(_._1 == 428L).map(_._2).contains(37))
  }

  test("join_skew_salted equals the unsalted join: 25 nations, 1500 orders total") {
    val rows = run("join_skew_salted").collect()
    assert(rows.length == 25)
    assert(rows.map(_.getLong(1)).sum == 1500L)
  }

  test("fn_json_table: 3 rows per event, kx = k * (idx + 1), et/k round-trip intact") {
    import org.apache.spark.sql.functions._
    val rows = run("fn_json_table").collect()
    val nEvents = Tables.events(s, d).count()
    assert(rows.length == 3 * nEvents)
    // the JSON round-trip must not mangle a single typed value
    rows.foreach { r =>
      val (k, idx, kx) = (r.getInt(2), r.getInt(3), r.getInt(4))
      assert(idx >= 0 && idx <= 2 && kx == k * (idx + 1))
    }
    val direct = Tables.events(s, d).select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    rows.foreach { r =>
      val (et, k) = direct(r.getLong(0))
      assert(r.getString(1) == et && r.getInt(2) == k)
    }
  }

  test("text_verbatim_spans matches a hash-free string-based re-derivation") {
    // independent twin: actual 8-word substrings compared as STRINGS —
    // no polynomial hashing anywhere — so this also proves the rolling
    // hash is collision-free on the fixture
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
      .toSeq
    val expected = SpanTwin.stringSpans(docs)
    val got = run("text_verbatim_spans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected, s"got ${got.size} spans, expected ${expected.size}")
    // non-vacuous: at least one span strictly INSIDE a longer doc, so the
    // islands merge is exercised on real partial overlaps (a whole-doc
    // span of a duplicated short doc would not prove that)
    val docLen = docs.toMap.view.mapValues(_.length.toLong).toMap
    assert(got.nonEmpty && got.exists(t => t._4 < docLen(t._1)),
      "fixture must produce at least one sub-document span")
  }

  test("span_attribution matches the hash-free string twin") {
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1).toSeq)
      .toSeq
    val expected = SpanTwin.stringAttribution(docs)
    val got = run("span_attribution").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected, s"got ${got.size} pairs, expected ${expected.size}")
    assert(got.nonEmpty)
  }

  test("dedup_incremental: verdicts partition the new batch and cover every cross-split fuzzy pair") {
    val inc = run("dedup_incremental").collect()
    assert(inc.nonEmpty && inc.forall(_.getLong(0) % 5 == 0),
      "output rows must be exactly the new-batch docs")
    inc.foreach { r =>
      val dup = r.getInt(4) == 1
      assert(dup == !r.isNullAt(2), "is_dup and dup_of must agree")
      if (dup) {
        assert(r.getLong(2) % 5 != 0, "dup_of must be an index doc")
        assert(r.getLong(3) >= 1L)
      } else assert(r.getLong(3) == 0L)
    }
    s.catalog.clearCache()
    // completeness vs the symmetric near-dup pair set: every dedup_fuzzy
    // pair with one endpoint per split shares the same bands/guard/Jaccard
    // chain, so its new-side endpoint MUST be flagged dup here
    val dupSet = inc.filter(_.getInt(4) == 1).map(_.getLong(0)).toSet
    run("dedup_fuzzy").collect().foreach { p =>
      val (a, b) = (p.getLong(0), p.getLong(1))
      if (a % 5 == 0 && b % 5 != 0)
        assert(dupSet.contains(a), s"fuzzy pair ($a,$b): $a missing from dup set")
      if (b % 5 == 0 && a % 5 != 0)
        assert(dupSet.contains(b), s"fuzzy pair ($a,$b): $b missing from dup set")
    }
  }
}
