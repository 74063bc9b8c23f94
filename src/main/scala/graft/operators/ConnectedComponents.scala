package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation:
  * every node starts labelled with itself; each round takes the minimum
  * label over its neighbourhood (self-loops included) until a fixpoint.
  * Labels only ever decrease, so the loop converges in O(component
  * diameter) rounds — for near-duplicate clusters the diameter is tiny
  * (docs transitively chained through shared shingles), so 2-4 rounds in
  * practice, with `maxIter` as a safety bound.
  *
  * Every round is one shuffle join + one aggregation on the edge list —
  * shuffle-parallel on the node key, nothing driver-side except the
  * convergence check (a count, not a collect). At extreme graph scale the
  * published refinement is the large-star/small-star algorithm
  * (Kiveris et al., "Connected Components in MapReduce and Beyond"),
  * which shortcuts long chains; near-dup graphs never need it.
  */
object ConnectedComponents {

  /** `edges` (a, b) undirected, may be asymmetric/partial; `nodes` (node)
    * must cover every vertex (isolated ones included). Returns
    * (node, lbl) where lbl = min node id of the component.
    */
  def minLabel(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .union(nodes.select(col("node").as("a"), col("node").as("b")))
      .persist() // joined every round
    var labels = sym.groupBy("a").agg(min("b").as("lbl"))
      .withColumnRenamed("a", "node").persist()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = sym.join(labels, col("b") === col("node"))
        .groupBy("a").agg(min("lbl").as("lbl"))
        .withColumnRenamed("a", "node").persist()
      // labels are monotonically non-increasing: any strict decrease
      // means another round is needed
      val changed = next.as("n")
        .join(labels.as("o"), expr("n.node = o.node AND n.lbl < o.lbl"), "left_semi")
        .count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    // labels was materialized by the convergence count; drop the cached
    // edge list (recompute through lineage only on cache eviction)
    sym.unpersist(blocking = false)
    // returning unconverged labels would be SILENTLY wrong output (split
    // components) — fail loudly instead; maxIter bounds diameter, not a
    // best-effort budget
    require(converged,
      s"connected components did not converge within $maxIter rounds — component diameter exceeds maxIter")
    labels
  }
}
