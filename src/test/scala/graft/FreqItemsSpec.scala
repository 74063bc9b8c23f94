package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `freq_items` Misra–Gries aggregate is engine-specific output (the
  * decrement schedule depends on arrival order), so — like the HLL/GK
  * sketch keys — its CONTRACT is the guarantee set, gated here:
  * est ≤ true ≤ est + err for every reported item, every item with true
  * frequency > n/k reported, and both properties stable under
  * adversarial repartitioning (which exercises the mergeable-summaries
  * path: partial sketches per partition, k-th-largest subtraction on
  * merge).
  */
class FreqItemsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf

  private def exactCounts(rows: Seq[String]): Map[String, Long] =
    rows.groupBy(identity).view.mapValues(_.length.toLong).toMap

  /** Assert the full MG contract of one `freq_items(item, k)` result
    * against brute-force truth. */
  private def assertContract(result: Seq[Row], truth: Map[String, Long],
      n: Long, k: Int, where: String): Unit = {
    val est = result.map(r => r.getString(0) -> r.getLong(1)).toMap
    val errs = result.map(_.getLong(2)).distinct
    assert(errs.size <= 1, s"$where: err must be a single summary-level bound")
    val err = errs.headOption.getOrElse(0L)
    assert(result.size <= k - 1, s"$where: more than k-1 counters survived")
    assert(err <= n / k, s"$where: err $err above the n/k bound ${n / k}")
    est.foreach { case (item, e) =>
      val t = truth.getOrElse(item, 0L)
      assert(e <= t, s"$where: $item overestimated ($e > $t)")
      assert(t <= e + err, s"$where: $item undercount beyond err ($t > $e + $err)")
    }
    truth.filter(_._2 > n.toDouble / k).keys.foreach { hh =>
      assert(est.contains(hh), s"$where: guaranteed heavy hitter $hh missing")
    }
    // output order is part of the surface: (est DESC, item ASC)
    val key = result.map(r => (-r.getLong(1), r.getString(0)))
    assert(key == key.sorted, s"$where: result not sorted by (est desc, item asc)")
  }

  test("planted zipf stream: guarantees hold under 1, 4, and 13 partitions") {
    graft.functions.MisraGries.register(s)
    import s.implicits._
    // deterministic skewed stream: item i appears ~ 6000/i times
    val rows = (1 to 40).flatMap(i => Seq.fill(6000 / i)(s"item_$i"))
    val truth = exactCounts(rows)
    val n = rows.length.toLong
    val k = 8
    for (parts <- Seq(1, 4, 13)) {
      val res = rows.toDF("item").repartition(parts)
        .agg(expr(s"freq_items(item, $k)").as("f"))
        .selectExpr("inline(f)")
        .collect().toSeq
      assertContract(res, truth, n, k, s"parts=$parts")
      // the dominant item is far above n/k and must rank first
      assert(res.head.getString(0) == "item_1", s"parts=$parts top item")
    }
  }

  test("grouped aggregation: per-group sketches carry per-group bounds") {
    graft.functions.MisraGries.register(s)
    import s.implicits._
    val rows = (1 to 30).flatMap(i =>
      Seq.fill(1200 / i)(("even", s"e$i")) ++ Seq.fill(900 / i)(("odd", s"o$i")))
    val byGroup = rows.groupBy(_._1)
    val res = rows.toDF("g", "item").repartition(7)
      .groupBy("g").agg(expr("freq_items(item, 6)").as("f"))
      .collect().map(r => r.getString(0) -> r.getSeq[Row](1)).toMap
    assert(res.keySet == Set("even", "odd"))
    byGroup.foreach { case (g, grp) =>
      assertContract(res(g), exactCounts(grp.map(_._2)), grp.length.toLong, 6, g)
    }
  }

  test("fixture corpus: every token above n/k is reported with a truthful bound") {
    graft.functions.MisraGries.register(s)
    val toks = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val truth = toks.groupBy("tok").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = truth.values.sum
    val k = 32
    val res = toks.agg(expr(s"freq_items(tok, $k)").as("f"))
      .selectExpr("inline(f)").collect().toSeq
    assertContract(res, truth, n, k, "documents")
    assert(res.nonEmpty)
  }

  test("nulls are skipped, not counted, and an all-null column yields an empty sketch") {
    graft.functions.MisraGries.register(s)
    import s.implicits._
    val res = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("item").agg(expr("freq_items(item, 4)").as("f"))
      .selectExpr("inline(f)").collect()
    assert(res.map(r => r.getString(0) -> r.getLong(1)).toMap == Map("a" -> 2L, "b" -> 1L))
    val empty = Seq.empty[Option[String]].toDF("item")
      .agg(expr("freq_items(item, 4)").as("f")).collect()
    assert(empty.head.getSeq[Row](0).isEmpty)
  }

  test("plans as a two-phase aggregate: only sketches cross the shuffle") {
    graft.functions.MisraGries.register(s)
    import s.implicits._
    val plan = (1 to 100).map(i => s"it_$i").toDF("item").repartition(5)
      .agg(expr("freq_items(item, 8)"))
      .queryExecution.executedPlan.toString
    // partial on the map side + final after the exchange — the map-side
    // combine is the whole point of a mergeable TypedImperativeAggregate
    assert(plan.contains("partial_freq_items"), s"no partial phase:\n$plan")
    assert("(?<!partial_)freq_items".r.findFirstIn(plan).isDefined,
      s"no final phase:\n$plan")
  }

  test("fuzz: contract holds on 20 seeded stream shapes × random partition splits (JVM-level)") {
    // JVM-level MG fuzz (no Spark jobs — milliseconds): random zipf-ish
    // streams, random split into partial summaries, random merge order —
    // exactly the partial/final path the aggregate executes
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val k = 2 + rng.nextInt(15)
      val nItems = 1 + rng.nextInt(60)
      val stream = Seq.fill(200 + rng.nextInt(2000)) {
        // skewed: low ids exponentially more likely
        s"v${math.min(nItems - 1, (-math.log(rng.nextDouble()) * nItems / 4).toInt)}"
      }
      val truth = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = stream.length.toLong
      // split into 1..8 partials, fold each, merge in shuffled order
      val parts = rng.shuffle(stream).grouped(
        math.max(1, stream.length / (1 + rng.nextInt(8)))).toSeq
      val partials = parts.map { p =>
        val s = new graft.functions.MGSummary(k); p.foreach(s.add); s
      }
      val merged = partials.reduce { (a, b) => a.mergeIn(b); a }
      assert(merged.n == n, s"trial $trial n")
      assert(merged.counts.size <= k - 1, s"trial $trial size")
      val err = merged.maxError
      assert(err <= n / k, s"trial $trial err bound")
      merged.counts.foreach { case (item, est) =>
        val t = truth.getOrElse(item, 0L)
        assert(est <= t && t <= est + err,
          s"trial $trial k=$k $item est=$est true=$t err=$err")
      }
      truth.filter(_._2 > n.toDouble / k).keys.foreach(hh =>
        assert(merged.counts.contains(hh),
          s"trial $trial k=$k heavy hitter $hh (${truth(hh)} > $n/$k) missing"))
    }
  }

  test("serialization round-trips the summary exactly; width is validated") {
    val agg = graft.functions.MisraGries(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 5)
    val buf = agg.createAggregationBuffer()
    Seq("a", "b", "a", "c", "d", "a", "e", "b").foreach(buf.add)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.k == buf.k && back.n == buf.n && back.counts == buf.counts)
    intercept[IllegalArgumentException] {
      graft.functions.MisraGries(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 1)
    }
    // non-literal width must be rejected at build time
    intercept[Exception] {
      s.sql("SELECT freq_items(n_name, n_nationkey) FROM (SELECT 'x' n_name, 2 n_nationkey)")
        .collect()
    }
  }

  test("misuse fails at analysis, not executor-side: non-string column, NULL width") {
    graft.functions.MisraGries.register(s)
    // a BIGINT value column used to pass analysis and die in update()'s
    // UTF8String cast on an executor (r14 ADVICE) — checkInputDataTypes
    // must reject it during analysis with a readable message
    val e1 = intercept[Exception] {
      s.sql("SELECT freq_items(v, 5) FROM (SELECT 7 AS v)").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("string"), e1.getMessage)
    // a foldable NULL width folded to null and NPE'd in the builder
    val e2 = intercept[Exception] {
      s.sql("SELECT freq_items(v, CAST(NULL AS INT)) FROM (SELECT 'x' AS v)").collect()
    }
    assert(e2.getMessage.contains("non-NULL"), e2.getMessage)
  }
}
