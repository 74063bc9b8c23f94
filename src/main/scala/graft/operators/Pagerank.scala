package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration integer PageRank (damping 0.85, teleport 0.15) with the
  * same hybrid execution shape as [[ConnectedComponents]]:
  *
  *  - small graphs (nodes + edges under a broadcast-equivalent bound):
  *    collect the node and edge lists, run the rounds on the driver, and
  *    return the result as a local DataFrame. A lazily-composed
  *    `rounds × (join + agg)` plan on a tiny graph pays 10+ microscopic
  *    exchanges plus an AQE re-optimization per stage — measured ~3 s at
  *    sf0.1 for a 64-node graph whose arithmetic is microseconds.
  *  - larger graphs: the declarative loop — per round ONE shuffle join of
  *    the cached symmetric edge list against the current rank table plus
  *    one combinable aggregate, O(rounds) plan depth, the template for
  *    iterative fixed-point computation on Spark. AQE sizes the exchanges
  *    at runtime.
  *
  * Exactness (identical on driver, Spark, and DuckDB): rank mass is the
  * integer S = 10¹² split by truncating division at every step —
  * r(u) div deg(u) per edge, (15·S) div (100·n) teleport,
  * (85·Σ) div 100 damping. All values positive and ≤ 85·S ≪ 2⁶³, and
  * Long `/`, Spark `div`, DuckDB `//` all truncate, so the three
  * implementations are bit-identical by construction (gated in ScaleSpec
  * by a forced-path comparison and end-to-end by the oracle).
  *
  * Dangling/isolated nodes keep the teleport mass only (their outgoing
  * share is dropped — the standard simplification, same on all paths).
  */
object Pagerank {

  private val S = 1000000000000L

  /** `nodes` (node) — every vertex; `edges` (a, b) directed (callers
    * wanting the undirected walk pass both orientations). Returns
    * (node, r) after exactly `rounds` iterations from r0 = S div n.
    *
    * `localSolveMaxSize` bounds nodes + directed edges for the driver
    * path (the result is node-sized, so a graph past the bound must stay
    * distributed end-to-end anyway); -1 forces the distributed loop
    * (tests do, to pin loop semantics on small fixtures).
    */
  def fixedRounds(nodes: DataFrame, edges: DataFrame, rounds: Int,
      localSolveMaxSize: Long = 1L << 20): DataFrame = {
    val sym = graft.Caching.ensureCached(edges.select(col("a"), col("b")))
    val m = sym.count()
    // never count `nodes` (possibly corpus-sized) unless the edge count
    // alone fits the bound — mirrors ConnectedComponents, which also
    // never runs an eager job over the node frame on the big-graph path
    if (m <= localSolveMaxSize) {
      val n = nodes.count()
      if (n + m <= localSolveMaxSize) return localSolve(nodes, sym, rounds, n)
    }
    distributedLoop(nodes, sym, rounds)
  }

  private def localSolve(nodes: DataFrame, sym: DataFrame, rounds: Int,
      n: Long): DataFrame = {
    import scala.collection.mutable
    val nodeCol = nodes.select(col("node"))
    val ns: Array[Any] = nodeCol.collect().map(_.get(0))
    val es: Array[(Any, Any)] =
      sym.collect().map(r => (r.get(0), r.get(1)))
    // the local result references nothing distributed — drop the cached
    // edge list now (the Caching contract: operator-owned intermediates
    // the returned frame no longer needs must not stay pinned). The
    // distributed path keeps it: its returned plan reads sym lazily.
    sym.unpersist(blocking = false)
    val deg = mutable.HashMap.empty[Any, Long]
    es.foreach { case (a, _) => deg(a) = deg.getOrElse(a, 0L) + 1L }
    var r = mutable.HashMap.empty[Any, Long]
    ns.foreach(v => r(v) = S / n)
    for (_ <- 1 to rounds) {
      val s = mutable.HashMap.empty[Any, Long]
      es.foreach { case (a, b) =>
        // an edge whose source is outside `nodes` carries no rank — the
        // same silent drop the distributed path's inner join performs,
        // so the two hybrid paths stay identical on unclean input
        r.get(a).foreach(ra => s(b) = s.getOrElse(b, 0L) + ra / deg(a))
      }
      val next = mutable.HashMap.empty[Any, Long]
      ns.foreach { v =>
        next(v) = (15L * S) / (100L * n) + (85L * s.getOrElse(v, 0L)) / 100L
      }
      r = next
    }
    // schema from the SELECTED node column (nodes may carry more fields
    // in any order), not fields.head of the caller's frame
    val nodeField = nodeCol.schema.fields.head
    val schema = org.apache.spark.sql.types.StructType(Seq(
      nodeField.copy(name = "node"),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      new java.util.ArrayList[org.apache.spark.sql.Row](ns.length)
    ns.foreach(v => rows.add(org.apache.spark.sql.Row(v, r(v))))
    nodes.sparkSession.createDataFrame(rows, schema)
  }

  private def distributedLoop(nodes: DataFrame, sym: DataFrame,
      rounds: Int): DataFrame = {
    val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
    val cnt = nodes.agg(count(lit(1)).as("n_cnt"))
    var r = nodes.crossJoin(broadcast(cnt))
      .select(col("node"), expr(s"$S div n_cnt").as("r"))
    for (_ <- 1 to rounds) {
      val contrib = sym.join(r, sym("a") === r("node"))
        .join(deg, "a")
        .select(col("b"), expr("r div deg").as("m"))
        .groupBy("b").agg(sum("m").as("s"))
      r = nodes.crossJoin(broadcast(cnt))
        .join(contrib, col("node") === contrib("b"), "left_outer")
        .select(col("node"),
          expr(s"(15 * $S div (100 * n_cnt)) + (85 * coalesce(s, 0)) div 100").as("r"))
    }
    r.select(col("node"), col("r"))
  }
}
