package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanics proofs: salting preserves join semantics, bucketing
  * removes the join shuffle, and the flagship plan keeps pushdown/pruning.
  */
class ScaleSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterEach {
  private lazy val s = TestSpark.spark
  private val d = TestSpark.sf
  override def afterEach(): Unit = { s.catalog.clearCache(); super.afterEach() }

  test("SaltedJoin.inner equals the plain join on skewed data") {
    import graft.operators.SaltedJoin
    // skew: 90% of lineitem keys collapsed onto one join key
    val big = Tables.lineitem(s, d)
      .withColumn("k", when(col("l_orderkey") % 10 < 9, 0L).otherwise(col("l_orderkey")))
      .select("k", "l_quantity")
    val small = Tables.orders(s, d).limit(200)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
      .withColumn("k", when(col("k") % 10 < 9, 0L).otherwise(col("k")))
      .groupBy("k").agg(max("o_totalprice").as("p"))
    val plain = big.join(small, "k")
    val salted = SaltedJoin.inner(big, small, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.select("k", "l_quantity", "p")
      .except(plain.select("k", "l_quantity", "p")).count() == 0L)
  }

  test("bucketed tables join without a shuffle exchange") {
    val oj = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
    val lj = Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables across JVMs but leaves their
    // warehouse dirs behind — remove them or CTAS fails LOCATION_ALREADY_EXISTS
    for (t <- Seq("b_orders", "b_lineitem")) {
      val dir = new java.io.File(s"target/spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    oj.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    lj.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    val joined = s.table("b_lineitem")
      .join(s.table("b_orders"), expr("l_orderkey = o_orderkey"))
      .groupBy("o_custkey").agg(sum("l_quantity"))
    joined.collect() // force execution so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side (bucket co-location);
    // only the groupBy aggregation exchanges
    val joinSection = plan.substring(0, plan.indexOf("SortMergeJoin").max(0) + 1)
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))
    if (plan.contains("SortMergeJoin")) {
      // count exchanges: exactly the one for the final aggregation
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && !l.contains("REQUIRED_BY_STATEFUL"))
      assert(exchanges <= 1, s"expected <=1 exchange (agg only), plan:\n$plan")
    }
  }

  test("ConnectedComponents.minLabel matches reference union-find on random graphs") {
    import graft.operators.ConnectedComponents
    import s.implicits._
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 4) {
      val n = 20 + rnd.nextInt(30)
      val edges = Seq.fill(n / 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // reference: textbook union-find over the same edges
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val expected = (0 until n).map { v =>
        v.toLong -> (0 until n).filter(u => find(u) == find(v)).min.toLong
      }.toMap
      // both execution paths must agree with the reference: the forced
      // distributed loop AND the default (here: driver-local union-find)
      val loop = ConnectedComponents.minLabel(
        (0L until n.toLong).toDF("node"), edges.toDF("a", "b"),
        localSolveMaxEdges = -1L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(loop == expected, s"loop path, trial $trial (n=$n, edges=$edges)")
      val local = ConnectedComponents.minLabel(
        (0L until n.toLong).toDF("node"), edges.toDF("a", "b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == expected, s"local path, trial $trial (n=$n, edges=$edges)")
      val stars = ConnectedComponents.alternatingStars(
        (0L until n.toLong).toDF("node"), edges.toDF("a", "b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stars == expected, s"alternating-stars path, trial $trial (n=$n, edges=$edges)")
      // the endpoints-only variant must agree with the reference ON THE
      // PARTICIPANTS (it promises no coverage of isolated nodes), on
      // both of ITS paths: the LocalRelation fast path and the forced
      // distributed loop
      val participants = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val expParticipants = expected.view.filterKeys(participants).toMap
      val fromEdgesLocal = ConnectedComponents.minLabelFromEdges(
        edges.toDF("a", "b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fromEdgesLocal == expParticipants,
        s"minLabelFromEdges local path, trial $trial (n=$n, edges=$edges)")
      val fromEdgesLoop = ConnectedComponents.minLabelFromEdges(
        edges.toDF("a", "b"), localSolveMaxEdges = -1L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fromEdgesLoop == expParticipants,
        s"minLabelFromEdges loop path, trial $trial (n=$n, edges=$edges)")
    }
  }

  test("Pagerank.fixedRounds: local and forced-distributed paths agree with a reference") {
    import graft.operators.Pagerank
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    for (trial <- 1 to 3) {
      val n = 10 + rnd.nextInt(20)
      // directed edges incl. a guaranteed dangling node (n-1 never a
      // source) and one edge from OUTSIDE the node set — both paths must
      // silently drop its contribution (the distributed inner join's
      // behavior, mirrored by localSolve's r.get guard)
      val edges = Seq.fill(n * 2)(
        (rnd.nextInt(n - 1).toLong, rnd.nextInt(n).toLong)).distinct :+
        (n + 5L, 0L)
      // reference: direct integer recurrence, same truncating arithmetic;
      // sources outside the node set carry no rank
      val S = 1000000000000L
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = (0L until n.toLong).map(v => v -> S / n).toMap
      for (_ <- 1 to 5) {
        val sums = edges.groupBy(_._2).view.mapValues(
          _.flatMap { case (a, _) => r.get(a).map(_ / deg(a)) }.sum).toMap
        r = (0L until n.toLong).map(v =>
          v -> ((15L * S) / (100L * n) + (85L * sums.getOrElse(v, 0L)) / 100L)).toMap
      }
      val nodes = (0L until n.toLong).toDF("node")
      val local = Pagerank.fixedRounds(nodes, edges.toDF("a", "b"), rounds = 5)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(local == r, s"local path, trial $trial (n=$n)")
      val loop = Pagerank.fixedRounds(nodes, edges.toDF("a", "b"), rounds = 5,
        localSolveMaxSize = -1L)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(loop == r, s"forced-loop path, trial $trial (n=$n)")
    }
  }

  test("ConnectedComponents.minLabel: chains close transitively, islands stay apart") {
    import graft.operators.ConnectedComponents
    import s.implicits._
    // component {1,2,3} via chain 1-2, 2-3 (1 and 3 never share an edge),
    // component {5,6}, isolated node 9
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("node")
    val got = ConnectedComponents.minLabel(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("dedup_fuzzy plans as banded equi-joins: no nested-loop, no cartesian") {
    val plan = SparkEntry.queries("dedup_fuzzy")(s, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "minhash-band candidate join must stay an equi-join")
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedup_embedding's all-pairs join is over the ENFORCED bounded corpus") {
    val plan = SparkEntry.queries("dedup_embedding")(s, d)
      .queryExecution.executedPlan.toString
    // the exact O(n^2) variant is only offered behind the vec_id < 4096
    // bound — the scan itself must be pre-filtered (pushdown), so the
    // nested-loop can never see an unbounded corpus. Anchor the match to
    // the actual predicate/pushed-filter text: a bare "4096" could match
    // an expression ID (#4096) vacuously.
    val bound = "vec_id#\\d+L? < 4096".r.findFirstIn(plan).isDefined ||
      plan.contains("LessThan(vec_id,4096)")
    assert(bound, s"corpus bound predicate must appear in the plan:\n$plan")
  }

  test("dedup_ngram_jaccard caps shingle doc-frequency before the pair join") {
    val plan = SparkEntry.queries("dedup_ngram_jaccard")(s, d)
      .queryExecution.optimizedPlan.toString
    // the df <= 50 hot-shingle cap guards the quadratic join key; match
    // the actual filter condition, not a bare "50" (expression IDs make
    // that substring vacuously present)
    assert("df#\\d+L? <= 50".r.findFirstIn(plan).isDefined,
      "doc-frequency cap must survive optimization")
    assert(!plan.contains("CartesianProduct"))
  }

  test("join_theta_range joins equi on (user, time bucket), band as residual") {
    val plan = SparkEntry.queries("join_theta_range")(s, d)
      .queryExecution.executedPlan.toString
    // the 10-min bucket must be part of the join's EQUI keys (bounding
    // candidates per bucket so a hot user can't go quadratic), not just a
    // filter somewhere in the plan. At sf0.001 the side auto-broadcasts —
    // any EQUI join form carries the same key structure at scale.
    val joinLine = plan.linesIterator
      .find(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("BroadcastHashJoin"))
      .getOrElse(fail(s"no equi-join in plan:\n$plan"))
    assert(joinLine.contains("probe_bkt") && joinLine.contains("b_bkt"),
      s"bucket column must be an equi key: $joinLine")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("ConnectedComponents converges on a 200-node path (diameter >> rounds)") {
    import graft.operators.ConnectedComponents
    import s.implicits._
    // a path graph 0-1-2-...-199: min-label PROPAGATION alone needs ~199
    // rounds; pointer jumping must close it within the default maxIter=50
    // (expected ~log2(200) + small constant)
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val nodes = (0L until 200L).toDF("node")
    val got = ConnectedComponents.minLabel(nodes, edges,
      localSolveMaxEdges = -1L).collect()
    assert(got.length == 200)
    assert(got.forall(_.getLong(1) == 0L), "all labels must collapse to 0")
    // the hub-proof large-star/small-star variant must close the same
    // path within its O(log n) round budget, and a star graph (maximal
    // hub) must converge immediately
    val stars = ConnectedComponents.alternatingStars(nodes, edges).collect()
    assert(stars.length == 200 && stars.forall(_.getLong(1) == 0L))
    val hubEdges = (1L until 100L).map(i => (0L, i)).toDF("a", "b")
    val hubNodes = (0L until 100L).toDF("node")
    val hub = ConnectedComponents.alternatingStars(hubNodes, hubEdges).collect()
    assert(hub.length == 100 && hub.forall(_.getLong(1) == 0L))
  }

  test("dedup family leaves nothing behind that clearCache cannot clean") {
    // operators persist intermediates (documented contract); the harness
    // guarantee is that ONE clearCache call fully cleans the session — no
    // RDD-level persists/localCheckpoints that survive the SQL cache.
    // Baseline-relative: other suites share this session and may hold
    // their own caches.
    s.catalog.clearCache()
    val before = s.sparkContext.getPersistentRDDs.keySet
    for (q <- Seq("dedup_ngram_jaccard", "dedup_cluster", "dedup_fuzzy", "dedup_simhash")) {
      SparkEntry.queries(q)(s, d).write.format("noop").mode("overwrite").save()
    }
    s.catalog.clearCache()
    val leaked = s.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked RDD-level persistence: $leaked")
  }

  test("memo/cache-heavy family is re-entry-identical within one session") {
    // the session-keyed memos (pqFit, coarseFit) and the CC/gram cache
    // contracts all promise: running a key, clearing the cache, and
    // running it again returns the IDENTICAL result — no stale model
    // state, no order dependence, no recompute divergence. (A full
    // 180-key double-run probe validated this r13; the suite pins the
    // family where the memo/caching machinery actually lives.)
    for (q <- Seq("dedup_cluster", "dedup_retention", "graph_degree",
        "embedding_cluster", "ann_ivf", "ann_ivfpq", "ann_pq_adc")) {
      val r1 = SparkEntry.queries(q)(s, d).collect().map(_.toString).toSeq
      s.catalog.clearCache()
      val r2 = SparkEntry.queries(q)(s, d).collect().map(_.toString).toSeq
      s.catalog.clearCache()
      assert(r1 == r2, s"$q diverged on same-session re-entry")
    }
  }

  test("bpe_train retires its own token-layer caches without clearCache") {
    // the trainer's output is model-sized (built from per-round argmax
    // collects), so no returned plan reads the cached layers — the
    // operator must unpersist them itself rather than lean on the
    // session-level clearCache the way plan-returning operators may
    s.catalog.clearCache()
    val before = s.sparkContext.getPersistentRDDs.keySet
    assert(SparkEntry.queries("bpe_train")(s, d).collect().length == 6)
    val leaked = s.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"bpe_train left cached layers behind: $leaked")
  }

  test("re-entering the pair-graph kernel in one session neither double-caches nor leaks") {
    // graph_degree and dedup_ngram_jaccard build the IDENTICAL pair graph;
    // running them back-to-back without clearCache is the library-user
    // composition graft.Caching's contract covers: the second entry must
    // reuse the cached pair frame (no new persistent RDDs) and one
    // clearCache must still clean the whole session
    s.catalog.clearCache()
    val before = s.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("graph_degree")(s, d)
      .write.format("noop").mode("overwrite").save()
    val after1 = s.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("dedup_ngram_jaccard")(s, d)
      .write.format("noop").mode("overwrite").save()
    val after2 = s.sparkContext.getPersistentRDDs.keySet
    assert((after2 -- after1).isEmpty,
      s"re-entry created new persistent RDDs: ${after2 -- after1}")
    s.catalog.clearCache()
    assert((s.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("re-entering dedup_containment neither re-pins the gram table nor leaks") {
    // regression for the review finding: the gram pin + retire must live
    // inside the cold branch — a warm second run (pairs already
    // plan-cached) must not re-persist/re-materialize the gram pipeline
    s.catalog.clearCache()
    val before = s.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("dedup_containment")(s, d)
      .write.format("noop").mode("overwrite").save()
    val after1 = s.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("dedup_containment")(s, d)
      .write.format("noop").mode("overwrite").save()
    val after2 = s.sparkContext.getPersistentRDDs.keySet
    assert((after2 -- after1).isEmpty,
      s"warm re-entry created new persistent RDDs: ${after2 -- after1}")
    s.catalog.clearCache()
    assert((s.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
  }

  test("join_skew_salted actually joins through the salt key") {
    val plan = SparkEntry.queries("join_skew_salted")(s, d)
      .queryExecution.executedPlan.toString
    // the salted shape: big side carries __salt, small side is exploded
    // once per salt, and the join condition includes __salt — without it
    // the query silently degrades to the plain (skew-prone) join
    assert(plan.contains("__salt"), s"salt key must reach the join:\n$plan")
    assert(plan.contains("explode"), "small side must replicate via explode")
    assert(!plan.contains("CartesianProduct"))
  }

  test("decontaminate broadcasts the benchmark side and stays an equi-join") {
    val plan = SparkEntry.queries("decontaminate")(s, d)
      .queryExecution.executedPlan.toString
    // the benchmark shingle set is small by construction — the train
    // stream must probe it map-side, never shuffle-join against it
    assert(plan.contains("BroadcastHashJoin"), s"bench side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("text_repetition is a map-only pass: no aggregate or join shuffle") {
    val plan = SparkEntry.queries("text_repetition")(s, d)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the final presentation sort's range
    // partitioning — a hashpartitioning exchange would mean the quality
    // signal stopped fusing into the scan
    assert(!plan.contains("hashpartitioning"), s"unexpected shuffle:\n$plan")
    assert(!plan.contains("Join"), "per-row signal must not join")
  }

  test("events_funnel keys every stage on user_id — no cartesian, no ts sort") {
    val plan = SparkEntry.queries("events_funnel")(s, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // earliest-completion semantics must come from min-aggregates, not a
    // per-user global sort (which a hot user would serialise)
    assert(!plan.toLowerCase.contains("window"), "funnel must not use a window sort")
  }

  test("flagship plan: filter pushdown and column pruning reach the scan") {
    val plan = queries.Relational.flagship(s, d).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") || readSchema == "",
      "lineitem scan must not read unused wide columns")
  }

  test("partitioned write + partition pruning: lang filter prunes to one directory") {
    // the cluster path for a 100 TB corpus: partition the table at rest
    // on a low-cardinality routing column so per-lang readers touch 1/Nth
    // of the files. Write via the library's sink, then prove the filter
    // becomes a PartitionFilter (metadata pruning), not a row filter.
    // project-local tmp dir (not a fixed /tmp path): concurrent or
    // multi-user runs must not collide, and stale prior-run data must
    // never be read
    val tmpBase = java.nio.file.Paths.get("target/tmp").toAbsolutePath
    java.nio.file.Files.createDirectories(tmpBase)
    val outDir = java.nio.file.Files.createTempDirectory(tmpBase, "graft_part_docs")
    val out = outDir.toString
    try {
      graft.sources.Sources.writeParquet(
        Tables.documents(s, d), out, partitionBy = Seq("lang"))
      val read = s.read.parquet(out).filter(col("lang") === "en")
      val plan = read.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("lang"),
        s"lang filter must prune partitions at plan time:\n$plan")
      // pruning is real: only the en directory's rows are read, and the
      // count matches the unpartitioned filter
      val expected = Tables.documents(s, d).filter(col("lang") === "en").count()
      assert(read.count() == expected && expected > 0)
      // the en-EQUALITY predicate itself must be a partition filter — an
      // attribute-reference fallback (lang#…) would pass vacuously
      val enOnly = plan.linesIterator.find(_.contains("PartitionFilters")).get
      assert("lang#\\d+\\s*=\\s*en\\b".r.findFirstIn(enOnly).isDefined,
        s"(lang = en) must be pushed as a partition filter: $enOnly")
    } finally {
      java.nio.file.Files.walk(outDir)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("driver-order ANN keys train each model exactly once per session") {
    // the r13 driver bench showed BOTH ann_ivf and ann_ivfpq paying
    // fit-scale cost; this pins the SessionMemo sharing under the exact
    // execution order the driver uses (alphabetical), in a FRESH session
    // (newSession = new memo key), by TRAIN COUNT — wall-clock asserts
    // are host-noise-flaky, an AtomicInteger is not
    val s2 = s.newSession()
    val c0 = graft.queries.LlmOps.coarseFitRuns.get()
    val p0 = graft.queries.LlmOps.pqFitRuns.get()
    for (q <- Seq("ann_ivf", "ann_ivfpq", "ann_lsh_bucket", "ann_pq_adc",
        "embedding_pq"))
      SparkEntry.queries(q)(s2, d).write.format("noop").mode("overwrite").save()
    assert(graft.queries.LlmOps.coarseFitRuns.get() - c0 == 1,
      "coarse quantizer must train exactly once across ann_ivf + ann_ivfpq")
    assert(graft.queries.LlmOps.pqFitRuns.get() - p0 == 1,
      "PQ codebook must train exactly once across ann_ivfpq + ann_pq_adc + embedding_pq")
    s2.catalog.clearCache()
  }

  test("SessionMemo bounds a single session's entries and releases evicted pins") {
    import org.apache.spark.storage.StorageLevel
    val memo = new SessionMemo[Int, org.apache.spark.sql.DataFrame]
    def frame(i: Int) = { val f = s.range(i, i + 10).toDF("v"); f.persist(); f }
    val first = memo.getOrElseUpdate(s, 0)((_, _) => frame(0))
    assert(first.storageLevel != StorageLevel.NONE)
    // fill to one past the bound from the SAME session: the oldest entry
    // (key 0) must be evicted and its pinned frame unpersisted
    for (i <- 1 to SessionMemo.MaxEntries) memo.getOrElseUpdate(s, i)((_, _) => frame(i))
    assert(first.storageLevel == StorageLevel.NONE,
      "evicted entry's pinned frame must be unpersisted")
    var recomputed = false
    memo.getOrElseUpdate(s, 0) { (_, _) => recomputed = true; s.range(1).toDF("v") }
    assert(recomputed, "an evicted key must recompute on re-request")
    s.catalog.clearCache()
  }

  test("SessionMemo evicting another session's entry unpersists what it pinned") {
    import org.apache.spark.storage.StorageLevel
    val memo = new SessionMemo[Int, org.apache.spark.sql.DataFrame]
    val other = s.newSession()
    val pinned = memo.getOrElseUpdate(other, -1) { (ss, _) =>
      val f = ss.range(10).toDF("v"); f.persist(); f
    }
    assert(pinned.storageLevel != StorageLevel.NONE)
    // crossing the bound from the current session evicts OTHER sessions
    // first — and must release their cached blocks, not leak them in the
    // shared CacheManager until that session's own clearCache
    for (i <- 0 until SessionMemo.MaxEntries)
      memo.getOrElseUpdate(s, i)((_, _) => s.range(1).toDF("v"))
    assert(pinned.storageLevel == StorageLevel.NONE,
      "evicted session's pinned frame must be unpersisted")
    s.catalog.clearCache()
  }
}
