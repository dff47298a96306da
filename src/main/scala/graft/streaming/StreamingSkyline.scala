package graft.streaming

import graft.operators.Skyline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Skyline]]: a running 2-D Pareto
  * frontier over a point stream.
  *
  * The frontier is EXACTLY mergeable state — folding a new point into the
  * staircase is the same operation [[Skyline.localSkyline]] applies per
  * partition, and dominance is arrival-order-free (a point dominated by a
  * later arrival is evicted; one dominated by an earlier arrival is never
  * admitted) — so after ANY stream prefix the state equals the batch
  * skyline of that prefix, bit-for-bit (spec-asserted mid-stream and
  * final). State is O(frontier) — expected O(log n) points on random
  * input — the streaming-skyline literature's whole premise.
  *
  * Keying: the fold groups by `groupCol` (a frontier per group — e.g. per
  * event_type). The per-group state is frontier-sized, and parallelism is
  * #groups, same shape as every other stateful twin here. A single global
  * frontier is `lit(1)` grouping with one frontier-sized state — fine
  * because the state stays tiny even when the stream is not.
  *
  * Output mode Update: each batch that changes a group's frontier emits
  * the group's FULL refreshed frontier (frontier-sized, so re-emitting it
  * is cheap); downstream overwrites by group key.
  *
  * Duplicate copies of a frontier point are retained in state — that is
  * the batch operator's semantics, and prefix equality requires it. A
  * stream that repeats one frontier point unboundedly therefore grows
  * state with the copy count; exact-dedup upstream if copies don't matter.
  */
object StreamingSkyline {

  /** (grp, x, y) frontier rows after each batch; `points` needs
    * (grp: String, x: Long, y: Double). */
  def run(points: DataFrame): DataFrame = {
    val session = points.sparkSession
    import session.implicits._
    points.select(col("grp"), col("x").cast("long"), col("y").cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[(Long, Double)], (String, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (grp: String, rows: Iterator[(String, Long, Double)],
         state: GroupState[Array[(Long, Double)]]) =>
          val prev = state.getOption.getOrElse(Array.empty[(Long, Double)])
          // fold prev frontier + batch through the identical batch sweep
          // (that is what makes the prefix-equality property free) —
          // directly over tuples; NaN points are excluded like the batch
          // operator's input filter does
          val it = prev.iterator ++
            rows.map(r => (r._2, r._3)).filter(p => !p._2.isNaN)
          val frontier = Skyline.sweepGeneric[(Long, Double)](
            it, _._1, _._2, identity).toArray.sorted
          state.update(frontier)
          frontier.iterator.map(p => (grp, p._1, p._2))
      }
      .toDF("grp", "x", "y")
  }
}
