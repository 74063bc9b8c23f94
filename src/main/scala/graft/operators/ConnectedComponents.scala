package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation WITH pointer
  * jumping: every node starts labelled with itself; each round
  * (1) propagates the minimum label across the neighbourhood (self-loops
  * included), then (2) shortcuts by relabelling through the freshly
  * propagated table (`lbl(u) := lbl(lbl(u))`). Labels only ever decrease
  * and stay inside the component (every label is a member node's id), so
  * the fixpoint is the component-minimum everywhere; the shortcut halves
  * the distance to the minimum each round, giving O(log diameter) rounds
  * instead of O(diameter) — a 200-node path converges in ~9 rounds (see
  * ScaleSpec). This is the standard label-propagation + path-compression
  * scheme; the large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce and Beyond") additionally rewires edges, which
  * near-dup graphs never need.
  *
  * Cost shape per round: ONE shuffle join of the (cached) edge list with
  * the label table + one aggregation, plus a label-table self-join (tiny:
  * one row per node). The convergence check is folded into the same
  * aggregation — the self-loop row carries each node's previous label, so
  * "did anything change" is a filter-count on the round's own output, not
  * an extra join: one substantive Spark action per round (plus a
  * micro-job pinning the relabelled cache).
  *
  * Memory/lineage hygiene: each round's labels are re-wrapped as a
  * `LogicalRDD` (`createDataFrame(df.rdd, schema)`), so the Catalyst plan
  * stays O(1) deep across rounds instead of accreting one join+agg per
  * iteration. Unlike `localCheckpoint` this keeps full recompute lineage
  * (safe under cache eviction) and puts nothing in the block manager
  * outside the SQL cache, so `spark.catalog.clearCache()` fully cleans up.
  * Each round unpersists the previous round's cache; only the RETURNED
  * label frame stays cached (it was materialized by the final convergence
  * count) — callers should unpersist it after consuming the result.
  */
object ConnectedComponents {

  /** `edges` (a, b) undirected, may be asymmetric/partial; `nodes` (node)
    * must cover every vertex (isolated ones included). Returns
    * (node, lbl) where lbl = min node id of the component.
    *
    * `graphSizeHint` = edge count if the caller already knows it (e.g.
    * from a materialized cache); -1 = count here. The size picks the
    * loop's shuffle width: an iterative loop pays FIXED per-stage
    * scheduling/AQE overhead every round, so running a 100-node label
    * frame through 32-partition exchanges costs ~10x the actual work
    * (measured: 5.2 s -> sub-second at sf0.1). One partition per ~200k
    * edges, capped at default parallelism, keeps huge graphs fully
    * parallel and tiny graphs overhead-free. The width is applied via
    * `spark.sql.shuffle.partitions` for the duration of the loop and
    * restored after (the session is assumed single-query during an
    * action, which is how Verify/Bench/tests run).
    */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50,
      graphSizeHint: Long = -1L): DataFrame = {
    val spark = nodes.sparkSession
    val m = if (graphSizeHint >= 0L) graphSizeHint else edges.count()
    val p = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (m / 200000L).toInt + 1))
    val origParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", p.toString)
    try minLabelLoop(spark, nodes, edges, maxIter, p)
    finally spark.conf.set("spark.sql.shuffle.partitions", origParts)
  }

  private def minLabelLoop(spark: org.apache.spark.sql.SparkSession,
      nodes: DataFrame, edges: DataFrame, maxIter: Int, p: Int): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .union(nodes.select(col("node").as("a"), col("node").as("b")))
      .coalesce(p) // narrow the union's inherited partitioning: every
                   // round's map side re-reads this cache
      .persist() // joined every round
    var labels = sym.groupBy("a").agg(min("b").as("lbl"))
      .withColumnRenamed("a", "node").persist()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // propagate: min label over the neighbourhood; the (a, a) self-loop
      // row doubles as the carrier of a's PREVIOUS label, so the change
      // count below needs no join against the old table
      val prop = sym.join(labels, col("b") === col("node"))
        .groupBy("a").agg(
          min("lbl").as("plbl"),
          min(when(col("a") === col("b"), col("lbl"))).as("prev_lbl"))
        .withColumnRenamed("a", "node")
        .persist() // two consumers below (both sides of the shortcut join)
      // shortcut (pointer jumping): lbl(u) := plbl(plbl(u)). Every plbl
      // value is itself a node id present in `prop` (labels are always
      // member ids), so the inner join is total.
      val next = prop
        .join(prop.select(col("node").as("l_node"), col("plbl").as("l_lbl")),
          col("plbl") === col("l_node"))
        .select(col("node"), col("l_lbl").as("lbl"), col("prev_lbl"))
        .persist()
      // the round's one substantive action: materializes the round's
      // caches and counts strict decreases
      val changed = next.filter(col("lbl") < col("prev_lbl")).count()
      // re-wrap as LogicalRDD: O(1) plan depth regardless of round count.
      // Pin the wrapped cache (a micro-job over `next`'s cache) BEFORE
      // retiring the round's intermediates, or the next round would
      // recompute the whole chain through the dropped caches.
      val nextLabels = next.select("node", "lbl")
      val wrapped = spark.createDataFrame(nextLabels.rdd, nextLabels.schema).persist()
      wrapped.count()
      prop.unpersist(blocking = false)
      next.unpersist(blocking = false)
      labels.unpersist(blocking = false)
      labels = wrapped
      converged = changed == 0
      iter += 1
    }
    // labels was materialized by the convergence count; drop the cached
    // edge list (recompute through lineage only on cache eviction)
    sym.unpersist(blocking = false)
    // returning unconverged labels would be SILENTLY wrong output (split
    // components) — fail loudly instead; maxIter bounds log2(diameter),
    // not a best-effort budget
    require(converged,
      s"connected components did not converge within $maxIter rounds — component diameter exceeds 2^$maxIter")
    labels
  }
}
