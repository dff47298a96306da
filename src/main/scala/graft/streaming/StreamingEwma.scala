package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `q_ewma` — and the EXACT form of it: the batch query
  * windows the recursion into a bounded 16-tap horizon because SQL windows
  * cannot carry per-row-varying coefficients, but a stream fold CAN run
  * the true recursion `e ← α·x + (1−α)·e` — per key the state is ONE
  * double, updated per event, forever. The streaming operator is the
  * mathematically stronger twin (no truncation), which is the opposite of
  * the usual batch-exact/stream-sketch relationship ([[StreamingKmv]],
  * [[StreamingProfile]]) and worth stating: recursions with O(1) state are
  * native to streams and awkward in windows.
  *
  * Within a micro-batch, rows are folded in (ts, event_id) order — batch
  * contents arrive unordered from the shuffle. ACROSS batches the fold
  * applies arrival order: exact event-time EWMA under in-order delivery
  * (the kappa-pipeline norm); out-of-order sources would need a
  * watermark-buffered variant that holds rows until the watermark seals
  * their order — the [[SessionDedup]]-style state upgrade, documented,
  * not built. Output mode Update: one refreshed (user_id, ewma) row per
  * key per batch that touched it.
  */
object StreamingEwma {

  def run(events: DataFrame, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val session = events.sparkSession
    import session.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Double, (Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Double)],
         state: GroupState[Double]) =>
          val ordered = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
          var e = state.getOption.getOrElse(Double.NaN)
          ordered.foreach { r =>
            e = if (e.isNaN) r._4 else alpha * r._4 + (1 - alpha) * e
          }
          state.update(e)
          Iterator.single((uid, e))
      }
      .toDF("user_id", "ewma")
  }
}
