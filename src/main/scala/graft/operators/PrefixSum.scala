package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group prefix sum — the two-phase replacement for
  * `sum(n).over(Window.partitionBy(group).orderBy(id))`.
  *
  * The single-window form is the one plan shape that cannot survive a
  * scale-up no matter how narrow the rows: Spark executes an
  * unbounded-preceding running sum by shuffling EVERY row of a window
  * partition into ONE task and sorting there, so a corpus whose bulk lives
  * in one `source` (the CommonCrawl-shaped reality of a pretraining mix)
  * funnels billions of per-document rows through a single straggler. The
  * classic fix is the textbook two-phase scan (Blelloch; every
  * MPI_Exscan): split the id axis into buckets, compute per-bucket
  * subtotals, turn the subtotals into running bucket offsets, and finish
  * with an in-bucket running sum — every phase is either tiny or
  * partitioned by (group, bucket), so the max task is one bucket of one
  * group, `~N/nBuckets` rows, and shrinks as the caller raises
  * `nBuckets` with the data.
  *
  * Bucketing must be a MONOTONE, DETERMINISTIC pure function of the id —
  * monotone so in-bucket order + bucket offsets compose to the global
  * order, deterministic so the two evaluations of `perRow` (subtotal pass
  * and final pass) agree even though Spark re-runs the plan for each.
  * `repartitionByRange`/`spark_partition_id` fail the second requirement
  * (range boundaries are re-sampled per evaluation), so the boundaries are
  * sampled ONCE here via `approxQuantile` on a caller-supplied cheap id
  * frame (for parquet corpora: a doc_id-only scan, column-pruned to one
  * narrow column) and baked into the plan as literals. Quantile (not
  * fixed-width id ranges) keeps buckets balanced under arbitrary id
  * distributions — sparse hash ids and dense sequences alike.
  *
  * The answer is bucket-invariant by construction: any monotone bucketing
  * yields the same `cum_start`, so oracle SQL written against the naive
  * window form stays the definition and boundary skew costs only balance,
  * never correctness.
  */
object PrefixSum {

  /** Adds `cum_start` = sum of `nCol` over rows of the same `source` with
    * strictly smaller `doc_id` — exactly
    * `sum(nCol).over(partitionBy(source).orderBy(doc_id)) - nCol`, but
    * with the max task bounded by one (source, bucket) cell instead of a
    * whole source.
    *
    * `perRow` must carry (`source`, `doc_id` unique per source, `nCol`);
    * it is evaluated twice (subtotal + final pass), so callers whose rows
    * are born from an expensive chain should checkpoint first.
    * `idsForBounds` is any frame whose `doc_id` column approximates the
    * id distribution — pass the cheapest one available (the raw corpus
    * scan pruned to doc_id); it only steers balance.
    */
  def cumStart(perRow: DataFrame, nCol: String, idsForBounds: DataFrame,
               nBuckets: Int): DataFrame =
    cumStartWithBounds(perRow, nCol, sampleBoundaries(idsForBounds, nBuckets))

  /** The one `approxQuantile` job that bakes bucket boundaries into the
    * plan — exposed so a STORED artifact can sample once at build and
    * reuse the boundaries on every append/maintained batch (answers are
    * bucket-invariant by construction, so staleness costs only balance;
    * the [[graft.llm.TrainingShards]] packed store persists these in its
    * params part). */
  def sampleBoundaries(idsForBounds: DataFrame, nBuckets: Int): Array[Long] = {
    require(nBuckets >= 1, s"PrefixSum: nBuckets must be >= 1, got $nBuckets")
    if (nBuckets == 1) Array.empty
    else idsForBounds
      .select(col("doc_id").cast("double").as("__id"))
      .stat.approxQuantile("__id",
        (1 until nBuckets).map(_.toDouble / nBuckets).toArray,
        1.0 / math.max(100, 4 * nBuckets))
      .map(d => math.floor(d).toLong).distinct.sorted
  }

  /** [[cumStart]] against PRE-SAMPLED boundaries — no quantile job. The
    * boundaries need only be sorted/distinct longs; ANY monotone bucketing
    * yields the same answer (spec-pinned), so stale or even empty
    * boundaries are a balance knob, never a correctness one. */
  def cumStartWithBounds(perRow: DataFrame, nCol: String,
                         boundaries: Array[Long]): DataFrame = {
    // bucket = #boundaries <= doc_id: monotone in doc_id, pure, codegen'd
    // (a <=nBuckets-element in-row scan — no join, no shuffle)
    val bucket: Column =
      if (boundaries.isEmpty) lit(0)
      else size(filter(array(boundaries.map(lit(_)): _*), b => b <= col("doc_id")))
    val withBkt = perRow.withColumn("__bkt", bucket)
    // phase 1: per-(source, bucket) subtotals — one map-side-combining
    // aggregation whose output is #sources × nBuckets rows
    val subs = withBkt.groupBy(col("source"), col("__bkt"))
      .agg(sum(col(nCol)).as("__sub"))
    // phase 2: running bucket offsets over the TINY subtotal table (the
    // per-source window here sorts nBuckets rows, not the corpus)
    val offW = Window.partitionBy(col("source")).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = subs
      .select(col("source"), col("__bkt"),
        (sum(col("__sub")).over(offW) - col("__sub")).cast("long").as("__off"))
    // phase 3: in-bucket running sum — the window partitions by
    // (source, __bkt), so its exchange spreads a source over nBuckets
    // tasks and the per-task sort is one bucket
    val inW = Window.partitionBy(col("source"), col("__bkt"))
      .orderBy(col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBkt.join(broadcast(offs), Seq("source", "__bkt"))
      .withColumn("cum_start",
        (col("__off") + sum(col(nCol)).over(inW) - col(nCol)).cast("long"))
      .select(perRow.columns.map(col) :+ col("cum_start"): _*)
  }

  /** The bucket count a session's parallelism implies — the same knob as
    * `spark.sql.shuffle.partitions`, which is exactly the degree the final
    * window's exchange will use. */
  def defaultBuckets(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions
}
