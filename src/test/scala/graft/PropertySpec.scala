package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.3 — algebraic invariants across operators at sf0.001. */
class PropertySpec extends AnyFunSuite with org.scalatest.BeforeAndAfterEach {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  private def run(key: String) = SparkEntry.queries(key)(s, d)
  // the dedup family persists intermediates by contract; don't let them
  // accumulate across tests in the shared session
  override def afterEach(): Unit = { s.catalog.clearCache(); super.afterEach() }

  test("dedup_retention and dedup_cluster agree on every doc's cluster") {
    // both run the shared clusterLabels preamble — if they ever drift
    // (the r7 refactor's reason to exist), this catches it
    val ret = run("dedup_retention").select(col("doc_id"), col("cluster_id").as("c1"))
    val clu = run("dedup_cluster").select(col("doc_id"), col("cluster_id").as("c2"))
    assert(ret.join(clu, "doc_id").filter(col("c1") =!= col("c2")).count() == 0)
    assert(ret.count() == clu.count())
  }

  test("sample_stratified is a deterministic subset of documents") {
    val a = run("sample_stratified")
    val b = run("sample_stratified")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "two runs must be identical")
    val docs = Tables.documents(s, d).select("doc_id", "lang", "source")
    assert(a.exceptAll(docs).isEmpty, "sample must be a subset of the corpus")
  }

  test("text_redact leaves a doc unchanged exactly when it has no hits") {
    val out = run("text_redact")
      .join(Tables.documents(s, d).select("doc_id", "text"), "doc_id")
    assert(out.filter(col("n_ent") === 0 && col("red_text") =!= col("text")).count() == 0)
    assert(out.filter(col("n_ent") > 0 && col("red_text") === col("text")).count() == 0)
  }

  test("dedup_exact is idempotent") {
    val once = run("dedup_exact")
    assert(once.count() == once.distinct().count())
    // keys are unique after dedup
    assert(once.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0L)
  }

  test("window_frame_rows final running value equals the group total") {
    val last = run("window_frame_rows")
      .groupBy("o_custkey").agg(max("running").as("final"))
    val total = Tables.orders(s, d).groupBy("o_custkey")
      .agg(expr("cast(sum(cast(o_totalprice as decimal(18,6))) as double)").as("tot"))
    val joined = last.join(total, "o_custkey")
      .filter(abs(col("final") - col("tot")) > 1e-9)
    assert(joined.count() == 0L)
  }

  test("pivot_wide row sums equal agg_hash_sum per-flag totals") {
    val piv = run("pivot_wide").collect()
      .map(r => r.getString(0) -> (Option(r.get(1)).fold(0.0)(_.asInstanceOf[Double])
        + Option(r.get(2)).fold(0.0)(_.asInstanceOf[Double]))).toMap
    val agg = run("agg_hash_sum").collect()
      .groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(2)).sum }
    agg.foreach { case (f, tot) => assert(math.abs(piv(f) - tot) < 1e-6, s"flag $f") }
  }

  test("union_distinct of a set with itself is the set") {
    val ids = Tables.orders(s, d).select(col("o_custkey").as("id"))
    assert(ids.union(ids).distinct().count() == ids.distinct().count())
  }

  test("as-of matches are a subset of the theta-join predecessor relation") {
    // every non-null as-of pair (event, prev) must satisfy prev.ts < event.ts
    // for the same user — re-derive from the base table
    val e = Tables.events(s, d).select("event_id", "user_id", "ts_us")
    val asof = run("join_asof").filter(col("asof_event_id").isNotNull)
    val bad = asof
      .join(e.toDF("event_id", "u1", "t1"), "event_id")
      .join(e.toDF("asof_event_id", "u2", "t2"), "asof_event_id")
      .filter(col("u1") =!= col("u2") || col("t2") >= col("t1"))
    assert(bad.count() == 0L)
  }

  test("set algebra: |A∪B| = |A| + |B| - |A∩B| (distinct sets)") {
    val a = Tables.orders(s, d).select(col("o_custkey").as("id")).distinct()
    val b = Tables.events(s, d).select(col("user_id").as("id")).distinct()
    val union = run("set_union_distinct").count()
    val inter = run("set_intersect").count()
    assert(union == a.count() + b.count() - inter)
    assert(run("set_except").count() == a.count() - inter)
  }

  test("limit_topk rows are exactly the head of sort by the same key") {
    val top = run("limit_topk").collect().map(_.getLong(0)).toSeq
    val full = Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10).collect().map(_.getAs[Long]("o_orderkey")).toSeq
    assert(top == full)
  }

  test("mergedCoverage equals brute-force interval union on random event sets") {
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val sess = 100L
    // dense ts range so overlaps, touching intervals and duplicates all occur
    val events = (0 until 2000).map { i =>
      (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(3000).toLong)
    }
    val got = queries.Curation
      .mergedCoverage(events.toDF("user_id", "event_id", "ts_us"), sess)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // reference: merge sorted intervals per user in plain Scala
    val expected = events.groupBy(_._1).map { case (u, es) =>
      val iv = es.map(e => (e._3, e._3 + sess)).sortBy(_._1)
      val merged = iv.tail.foldLeft(List(iv.head)) { case (acc @ (s0, e0) :: rest, (s1, e1)) =>
        if (s1 <= e0) (s0, math.max(e0, e1)) :: rest else (s1, e1) :: acc
      }
      u -> ((merged.length.toLong, merged.map(m => m._2 - m._1).sum))
    }
    assert(got == expected)
  }

  test("applyChanges equals the in-memory upsert on random base/change sets") {
    import s.implicits._
    val rnd = new scala.util.Random(11L)
    val base = (0 until 500).map(i => (i.toLong, rnd.nextInt(1000).toDouble))
    val changes = (0 until 300).map { _ =>
      (rnd.nextInt(700).toLong, rnd.nextInt(1000).toDouble) // keys beyond 499 = inserts
    }.distinctBy(_._1) // MERGE semantics require unique change keys
    val got = queries.Curation.applyChanges(
      base.toDF("c_custkey", "c_acctbal"), changes.toDF("k", "bal"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
    val baseM = base.toMap
    val chgM = changes.toMap
    val expected = (baseM.keySet ++ chgM.keySet).map { k =>
      k -> (chgM.get(k) match {
        case Some(v) if baseM.contains(k) => (v, "U")
        case Some(v)                      => (v, "I")
        case None                         => (baseM(k), "K")
      })
    }.toMap
    assert(got == expected)
  }

  test("dedup_incremental flags planted near-copies of index docs and only new-batch rows") {
    // controlled-corpus recall: plant exact copies of two INDEX docs
    // (doc_id % 5 <> 0) at NEW-batch ids (% 5 == 0), write as a temp
    // documents table, and require the incremental probe to flag both
    // with dup_of = the copied index doc. Complements the fixture-based
    // GoldenSpec gates (which depend on organic dups) with guaranteed
    // positives through the same production path.
    import s.implicits._
    val src = Tables.documents(s, d).select("doc_id", "text", "lang", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val originals = src.filter(r => r._1 % 5 != 0 && r._2.split(" ").length >= 8).take(2)
    assert(originals.length == 2)
    val planted = originals.zipWithIndex.map { case (o, k) =>
      (9000L + k * 5, o._2, o._3, o._4, o._5) // 9000, 9005: both % 5 == 0
    }
    TestSpark.withTempDir("inc_prop") { dir =>
      (src.toSeq ++ planted).toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = SparkEntry.queries("dedup_incremental")(s, dir).collect()
      s.catalog.clearCache()
      assert(rows.forall(_.getLong(0) % 5 == 0), "only new-batch docs in output")
      planted.zip(originals).foreach { case (p, o) =>
        val r = rows.find(_.getLong(0) == p._1)
        assert(r.isDefined, s"planted doc ${p._1} missing from output")
        assert(r.get.getInt(4) == 1 && !r.get.isNullAt(2),
          s"planted exact copy ${p._1} of index doc ${o._1} must be flagged dup")
        assert(r.get.getLong(2) % 5 != 0, "dup_of must be an index doc")
      }
    }
  }

  test("text_verbatim_spans matches the string twin on randomized planted corpora") {
    // fuzz the span kernel (double rolling hash + islands merge) against
    // the hash-free SpanTwin on generated corpora with PLANTED shared
    // passages at random offsets — exercises partial spans, L-length
    // docs, multi-planted overlaps and plant-adjacency merges that the
    // fixture may not contain
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val vocab = Vector("kite", "drum", "vast", "moss", "lens", "fern",
      "bolt", "clay", "dusk", "reed", "silk", "tarn", "wick", "yarn")
    val L = queries.TextSim.SpanGramLen
    TestSpark.withTempDir("spans_prop") { dir =>
      for (trial <- 1 to 3) {
        val passage = Vector.fill(L + 2 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        val docs = (0 until 40).map { i =>
          val words0 = Vector.fill(L + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
          val words = if (i % 7 == 0) {
            val off = rnd.nextInt(words0.size + 1)
            words0.take(off) ++ passage ++ words0.drop(off)
          } else words0
          val text = words.mkString(" ")
          (i.toLong, text, "en", "src0", text.length.toLong)
        }
        docs.toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val got = SparkEntry.queries("text_verbatim_spans")(s, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSeq
        s.catalog.clearCache()
        val expected = SpanTwin.stringSpans(
          docs.map(t => t._1 -> t._2.split(" ", -1).toSeq))
        assert(got == expected, s"trial $trial: got ${got.size}, expected ${expected.size}")
        // every planted doc must carry a span covering its whole passage
        val planted = docs.filter(_._1 % 7 == 0).map(_._1).toSet
        assert(planted.forall(id =>
          got.exists(t => t._1 == id && t._4 >= passage.size)),
          s"trial $trial: a planted passage went undetected")
      }
    }
  }
}
