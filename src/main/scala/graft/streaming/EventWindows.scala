package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time streaming aggregation with watermarks — capability the
  * reference pipeline never needed (it is purely processing-time, SURVEY
  * §2.8 I2) but that any general streaming engine must provide: bounded
  * state via late-data eviction, and append-mode emission of *final*
  * per-window results.
  *
  * Both transforms are the streaming twins of batch queries
  * (`q_tumbling_window`, exact dedup): the same logical expression runs in
  * either mode, which is what makes the batch DuckDB oracle meaningful for
  * the streaming path.
  *
  * Scale notes: the window aggregation is a standard keyed-state hash
  * aggregate — state size is O(open windows × distinct keys), bounded by
  * the watermark horizon, and partial aggregation still applies map-side
  * within each micro-batch. Dedup state is one entry per key seen within
  * the watermark; the watermark is what keeps it from growing without
  * bound on an infinite stream.
  */
object EventWindows {

  /** Tumbling event-time counts — the slide == win special case of
    * [[hoppingCounts]] (window(ts, win) IS window(ts, win, win)): one
    * definition, so the aggregation/projection can never drift between
    * the twins. With `delay` watermark, append mode emits a
    * (window, event_type) row exactly once — when the watermark passes
    * the window end — and rows later than the watermark are dropped. */
  def tumblingCounts(events: DataFrame, delay: String, win: String): DataFrame =
    hoppingCounts(events, delay, win, win)

  /** Hopping (sliding) event-time counts — the `window(ts, win, slide)`
    * variant: each event lands in win/slide overlapping windows, and append
    * mode emits each (window, event_type) row exactly once when the
    * watermark passes that window's end. State is win/slide × the tumbling
    * equivalent (each open window is an independent keyed-state entry),
    * still bounded by the watermark horizon; the fan-out is a row-expansion
    * inside the aggregation exec, not an extra shuffle. */
  def hoppingCounts(events: DataFrame, delay: String,
                    win: String, slide: String): DataFrame =
    events.withWatermark("ts", delay)
      .groupBy(window(col("ts"), win, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Streaming exact dedup on `event_id`: keeps the first arrival, drops
    * re-deliveries that arrive within the watermark horizon; state for a
    * key is evicted once the watermark passes it. */
  def dedupEvents(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-STREAM inner join, time-bounded: pair each `left` row with the
    * `right` rows for the same `user_id` whose timestamp falls in
    * `[left.ts, left.ts + horizonSec]`. The two watermarks plus the range
    * condition are what make unbounded-state join feasible: Spark derives a
    * state eviction bound from them (a buffered left row can be dropped
    * once the right watermark passes `left.ts + horizon`). This is the
    * streaming twin of [[graft.operators.IntervalJoin]] — same predicate,
    * state-store buffering instead of bucket replication. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
                         delay: String, horizonSec: Int): DataFrame = {
    val l = left.withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
    val r = right.withWatermark("ts", delay)
      .select(col("user_id").as("user_id_r"), col("event_id").as("id_b"),
        col("ts").as("ts_b"))
    l.join(r,
      col("user_id") === col("user_id_r") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $horizonSec SECONDS"))
      .select(col("user_id"), col("id_a"), col("id_b"), col("ts_a"), col("ts_b"))
  }

  /** LEFT OUTER [[streamIntervalJoin]]: every left row eventually emits —
    * paired while matches exist, null-padded once the join can PROVE no
    * match can still arrive. That proof is the watermark mechanics outer
    * stream-stream joins hinge on: a buffered left row is held in state
    * until the RIGHT watermark passes `left.ts + horizon` (no qualifying
    * right row can be earlier than its watermark), and only then emitted
    * unmatched — so outer results are correct but delayed by horizon +
    * watermark, and state stays bounded by the same eviction rule as the
    * inner form. The unmatched-row latency is the price of exactly-once
    * outer semantics on an unbounded stream; a batch left join has no such
    * delay because its "no more data" proof is the end of input. */
  def streamIntervalJoinLeftOuter(left: DataFrame, right: DataFrame,
                                  delay: String, horizonSec: Int): DataFrame = {
    val l = left.withWatermark("ts", delay)
      .select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"))
    val r = right.withWatermark("ts", delay)
      .select(col("user_id").as("user_id_r"), col("event_id").as("id_b"),
        col("ts").as("ts_b"))
    l.join(r,
      col("user_id") === col("user_id_r") &&
        col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $horizonSec SECONDS"),
      "leftOuter")
      .select(col("user_id"), col("id_a"), col("id_b"), col("ts_a"), col("ts_b"))
  }
}
