package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer micro-units — the iterative
  * numeric companion to [[ConnectedComponents]]' fixpoint: CC answers
  * "which documents form one near-dup family", PageRank answers "which
  * member is the most central" (e.g. the canonical representative to keep
  * when clusters are large, or hub detection in a citation/link graph).
  *
  * Determinism is the design constraint, same as every oracle-checked
  * operator here: ranks live in integer micro-units (start 10⁶ per node),
  * each node's per-edge contribution is `pr div degree` (integer), and the
  * damping step is `150000 + (85 · Σcontrib) div 100` (integer) — no
  * floating accumulation anywhere, so Spark's partial-aggregation order
  * and DuckDB's sequential scan produce bit-identical ranks, and a
  * fixed iteration count unrolls into plain SQL CTEs for the oracle.
  *
  * Scale shape per iteration: one hash join of the symmetric edge list
  * with the current ranks on `src`, one map-side-combining sum keyed on
  * `dst`, one left join back to the node set. The edge list is
  * PRE-PARTITIONED by `src` once (hash repartition + localCheckpoint — the
  * in-memory analog of [[graft.sources.BucketedLayout]]'s on-disk bucket
  * layout; the checkpoint's LogicalRDD preserves the physical
  * HashPartitioning), so neither the per-round rank join nor the degree
  * aggregate ever re-exchanges the edges — the one data-sized shuffle per
  * round is the contribution sum on `dst`, pinned by PlanAuditSpec (≤ 2
  * exchanges in a round's plan, zero on the edge side). Ranks are
  * localCheckpointed per round so the lineage stays O(1) instead of
  * O(iterations).
  *
  * Graph semantics: `edges` is read as UNDIRECTED (symmetrized +
  * deduplicated); isolated nodes keep the pure damping mass 150000.
  */
object PageRank {

  /** Symmetrize, dedup, and pre-partition the edge list by `src` once; the
    * explicit partition count matches the session's shuffle partitioning so
    * EnsureRequirements accepts the checkpointed layout as-is every round
    * (an AQE-coalesced count could differ from the default and trigger a
    * round-trip re-exchange of the edges). */
  private[graft] def prepEdges(edges: DataFrame): DataFrame = {
    val n = edges.sparkSession.sessionState.conf.numShufflePartitions
    edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(n, col("src"))
      .localCheckpoint(true)
  }

  /** One iteration's contribution sum — factored out so PlanAuditSpec can
    * pin the exchange count of the round plan. */
  private[graft] def contribRound(sym: DataFrame, deg: DataFrame, r: DataFrame): DataFrame =
    sym
      .join(r.select(col("id").as("src"), col("pr")), "src")
      .join(deg, "src")
      .groupBy(col("dst").as("id"))
      .agg(sum(expr("pr div deg")).as("c"))

  /** @return (id, pr_micro) after `iters` rounds. */
  def apply(nodes: DataFrame, edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 20, s"PageRank: iters must be in [1, 20], got $iters")
    val n = nodes.select(col("id"))
    val sym = prepEdges(edges)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
    var r = n.withColumn("pr", lit(1000000L)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = contribRound(sym, deg, r)
      r = n.join(contrib, Seq("id"), "left_outer")
        .withColumn("pr", lit(150000L) + expr("(85 * coalesce(c, 0L)) div 100"))
        .select(col("id"), col("pr"))
        .localCheckpoint(true)
    }
    r.select(col("id"), col("pr").as("pr_micro"))
  }
}
