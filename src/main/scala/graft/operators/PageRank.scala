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
  * `dst`, one left join back to the node set. The edge list is symmetrized,
  * deduplicated and localCheckpointed ONCE so no round re-runs the upstream
  * pair-mining pipeline; ranks are localCheckpointed per round so the
  * lineage stays O(1) instead of O(iterations). Near-dup graphs are sparse
  * (|edges| ≈ verified pair count ≪ |nodes| = corpus), so AQE's runtime
  * stats broadcast the small side of the rank join per round — measured
  * here: a checkpoint-scan carries NO partitioning info (`Scan
  * ExistingRDD` reports unknown partitioning, so a `repartition(src)`
  * before the checkpoint does NOT survive into later rounds — verified on
  * the executed plan; that failed experiment cost ~30 % per round and was
  * reverted). When the edge list IS the big side — a web/link graph at
  * 100 TB — the zero-exchange layout that actually survives is the on-disk
  * [[graft.sources.BucketedLayout]] (bucketed parquet reports
  * HashPartitioning through the scan, SMJ with no edge-side Exchange,
  * pinned by BucketedLayoutSpec); that is the production move, not an
  * in-memory repartition.
  *
  * Graph semantics: `edges` is read as UNDIRECTED (symmetrized +
  * deduplicated); isolated nodes keep the pure damping mass 150000.
  */
object PageRank {

  /** Symmetrize, dedup, and checkpoint the edge list once — every round
    * reads the materialized edges instead of re-running the (possibly
    * expensive) pair-mining pipeline that produced them. */
  private[graft] def prepEdges(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)

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
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
    var r = n.withColumn("pr", lit(1000000L)).localCheckpoint(true)
    // TWO iterations per materialization (the ConnectedComponents fused-
    // pair shape, guide §2.4): iteration 2 of a pair chains lazily on
    // iteration 1 inside the same checkpoint job, halving the per-round
    // action count; ranks are exact integer arithmetic, so the
    // materialization points are invisible to the values.
    def step(cur: DataFrame): DataFrame =
      n.join(contribRound(sym, deg, cur), Seq("id"), "left_outer")
        .withColumn("pr", lit(150000L) + expr("(85 * coalesce(c, 0L)) div 100"))
        .select(col("id"), col("pr"))
    var done = 0
    while (done < iters) {
      val take = math.min(2, iters - done)
      var cur = r
      for (_ <- 1 to take - 1) cur = step(cur) // lazy intermediate round
      r = step(cur).localCheckpoint(true)
      done += take
    }
    r.select(col("id"), col("pr").as("pr_micro"))
  }
}
