package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `q_scd2` (`graft.relational.RelQueries.scd2`):
  * materialize SCD Type-2 dimension history as the changelog arrives.
  *
  * State per key is ONLY the open version — (version, state, valid_from,
  * tie-break event_id), O(1) per key forever; the closed history lives in
  * the sink, never in state (the property that makes per-key history
  * viable at 100 TB: state size tracks keys, not events). Each batch's
  * rows are sorted per key by (ts, event_id) before the fold (micro-batch
  * contents are unordered even when the source is in order — the
  * [[StreamingEwma]] convention), then: a row with the SAME state as the
  * open version extends it (no output, but it ADVANCES the fold frontier);
  * a NEWER row with a different state CLOSES the open version (emitting
  * its final [valid_from, valid_to) row, `open = false` — emitted exactly
  * once, when it closes) and opens the next; a row at-or-before the LAST
  * EVENT FOLDED — the (ts, event_id) frontier kept in state, NOT merely
  * the open version's start, since a same-state extend moves the frontier
  * without moving valid_from — is a late arrival and is dropped
  * (re-opening sink-committed history would mean unbounded state — the
  * documented order-sensitivity this twin shares with the EWMA recursion,
  * vs the order-FREE argmax of
  * [[StreamingCdc]]). Every touched key also re-emits its current open
  * version (`open = true`, `valid_to` null) per batch, so the sink's
  * (closed rows ∪ latest open row per key) equals the batch `scd2` of the
  * prefix whenever per-key arrival order respects (ts, event_id) —
  * spec-asserted mid-stream and at the end. Output mode Update.
  */
object StreamingScd2 {

  // version, state, validFromMicros, lastTsMicros, lastEventId — the last
  // two are the fold frontier: the newest (ts, event_id) ever folded for
  // the key, which a same-state extend advances while valid_from stays.
  private type OpenVersion = (Int, String, Long, Long, Long)

  def run(events: DataFrame): DataFrame = {
    val session = events.sparkSession
    import session.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("tsm"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenVersion, (Long, Int, String, Long, Option[Long], Boolean)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[OpenVersion]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var closed = List.empty[(Long, Int, String, Long, Option[Long], Boolean)]
          var cur = state.getOption.orNull
          sorted.foreach { case (_, tsm, eid, st) =>
            if (cur == null) cur = (1, st, tsm, tsm, eid)
            else if (tsm > cur._4 || (tsm == cur._4 && eid > cur._5)) {
              // newer than the frontier: fold it — close+open on a state
              // change, extend (frontier only) on the same state
              if (st != cur._2) {
                closed ::= ((uid, cur._1, cur._2, cur._3, Some(tsm), false))
                cur = (cur._1 + 1, st, tsm, tsm, eid)
              } else cur = (cur._1, cur._2, cur._3, tsm, eid)
            } // at-or-older than the last folded event: late drop
          }
          state.update(cur)
          (((uid, cur._1, cur._2, cur._3, Option.empty[Long], true)) :: closed)
            .reverse.iterator
      }
      .toDF("user_id", "version", "state", "valid_from_micros",
        "valid_to_micros", "open")
  }
}
