package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded (binned) interval join: all pairs of rows sharing a key whose
  * timestamps fall within a horizon of each other, found WITHOUT the
  * per-key cross product.
  *
  * A naive theta-join `a.ts <= b.ts AND b.ts <= a.ts + h` has no equi-key
  * beyond `user_id`, so Spark would shuffle on the key alone and compare
  * every within-key pair — O(rows-per-key²) per hot key. Binning both
  * sides to horizon-width buckets and replicating the LEFT row into its
  * own and the *next* bucket restores a composite equi-key (key, bin):
  * any b with `b.ts ∈ [a.ts, a.ts + h]` satisfies `bin(b) ∈ {bin(a),
  * bin(a)+1}` (bins are h wide), so the hash join touches only candidate
  * pairs and the exact predicate filters inside the bucket. Shuffle is
  * hash-partitioned on (key, bin) — 2× the left volume, never quadratic.
  * A pair can match in at most one bucket (b's bin is a single value), so
  * no post-join dedup is needed.
  *
  * This is the batch shape of a stream-stream interval join (Structured
  * Streaming bounds the same predicate with watermarks); the reference has
  * nothing comparable — its range join (SURVEY §2.5 J3) is one-sided
  * (`>=` only, resolved by argmax downstream).
  */
object IntervalJoin {

  /** Ordered pairs (a, b), same `user_id`, with `b.ts` in `[a.ts,
    * a.ts + horizonSec]` and `a.event_id != b.event_id`. */
  def pairsWithin(events: DataFrame, horizonSec: Int): DataFrame = {
    val binned = events.select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("bin", expr(s"unix_timestamp(ts) div $horizonSec"))
    val a = binned
      .select(col("user_id"), col("event_id").as("id_a"), col("ts").as("ts_a"),
        explode(array(col("bin"), col("bin") + 1)).as("jbin"))
    val b = binned
      .select(col("user_id"), col("event_id").as("id_b"), col("ts").as("ts_b"),
        col("bin").as("jbin"))
    a.join(b, Seq("user_id", "jbin"))
      .filter(col("ts_b") >= col("ts_a") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $horizonSec SECONDS") &&
        col("id_a") =!= col("id_b"))
      .select(col("user_id"), col("id_a"), col("id_b"), col("ts_a"), col("ts_b"))
  }
}
