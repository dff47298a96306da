package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation
  * ("hash-min"): every node repeatedly adopts the smallest label among
  * itself and its neighbors until a fixpoint.
  *
  * Each round is one shuffle join (edges hash-partitioned on `dst` against
  * the current labels) plus a map-side-combining `min` aggregation — no
  * driver-side graph state, so the rounds scale to any edge count the
  * cluster can shuffle. Rounds needed = the largest component's diameter.
  * That bound is why hash-min is the right choice for *near-duplicate
  * clustering*: LSH candidate components are dense quasi-cliques (every
  * member collided with a shared band bucket), so diameter is tiny (2-3)
  * and the O(log d) alternation of large-star/small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce") would add
  * complexity without saving rounds. For long-chain graphs that algorithm
  * is the drop-in upgrade.
  *
  * Per-iteration `localCheckpoint` truncates the logical plan: without it
  * the lineage doubles every round and Catalyst re-analyzes an
  * exponentially growing tree (the classic iterative-algorithm trap).
  *
  * Reference scope note: the reference pipeline has no graph operator at
  * all — this is a beyond-reference training-data operator (dedup clusters
  * over MinHash candidate pairs).
  *
  * @param nodes one column `id` — every vertex, including isolated ones
  * @param edges columns `src`, `dst` — undirected (symmetrized here)
  * @return (`id`, `label`) where `label` = min node id in the component
  */
object ConnectedComponents {

  def apply(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("label")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = sym.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("label").as("nlabel"))
      val next = labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("next_label"))
        .localCheckpoint(true)
      converged = next.filter(col("next_label") < col("label")).isEmpty
      labels = next.select(col("id"), col("next_label").as("label"))
      iter += 1
    }
    // Returning unconverged labels would silently split components (the
    // caller would keep duplicate documents); fail loudly instead — the
    // caller can raise maxIter for genuinely long-chain graphs.
    if (!converged) throw new IllegalStateException(
      s"ConnectedComponents did not converge in $maxIter rounds — component " +
        s"diameter exceeds maxIter; rerun with a larger maxIter")
    labels
  }
}
