package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of `q_session_window`: native event-time
  * `session_window` aggregation under a watermark — the gap-based
  * sessionization the batch query runs, as an incremental stream.
  *
  * Semantics worth pinning (and spec-pinned): sessions MERGE across
  * micro-batches — an event landing within `gap` of a session open in
  * state extends it, two sessions bridged by a late-arriving middle event
  * collapse into one — and a session is emitted exactly once, when the
  * watermark passes its end (Append mode). That makes the emitted set
  * equal the batch `session_window` aggregation over the same rows,
  * restricted to sessions the watermark has closed — the prefix-equality
  * property every stateful twin in this repo asserts.
  *
  * State is per-(user, open-session) and Spark drops it at emission —
  * bounded by concurrently-open sessions, not history. At 100 TB-rate
  * streams the knobs are the ones this function exposes: `gap` bounds
  * session extent, `watermark` bounds reorder tolerance AND state
  * retention; both are data-contract decisions, not tuning.
  */
object StreamingSessions {

  /** (user_id, session_start, session_end, n_events, total_value_micro)
    * per CLOSED session; `events` needs (user_id, ts, value). Integer
    * micro-units for the sum — same cross-engine determinism convention
    * as the batch oracles. */
  def run(events: DataFrame, gap: String = "10 seconds",
          watermark: String = "30 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 1000000) AS BIGINT)")).as("total_value_micro"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value_micro"))
}
