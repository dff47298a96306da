package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuously-maintained training-shard store: every micro-batch of
  * newly ingested documents is folded in as its own set of NEW shard
  * containers ([[graft.llm.TrainingShards.appendTrainingShards]]) — the
  * streaming form of "the corpus grows daily and the training data grows
  * with it". Shipped shards are never rewritten, so a training job can
  * consume the store while it grows.
  *
  * Exactly-once by the same convention as [[StreamingArtifact]]: the
  * shard-id base of batch N is a pure function of the manifest rows of
  * batches < N, and the manifest (written last) is `ingest_batch`-
  * partitioned with dynamic partition overwrite — a crash between the
  * container writes and the checkpoint commit replays the SAME batch id
  * with the SAME rows, which re-derives the same shard ids, renames over
  * the same container files, and rewrites only its own manifest
  * partition. Spec-pinned: stream-of-batches ≡ batch appends, and a
  * forced same-batch replay changes nothing (TrainingShardsSpec).
  *
  * The store must exist before the stream starts
  * ([[graft.llm.TrainingShards.writeTrainingShards]]); stream batch ids
  * map to manifest partitions `batchId + 1` so partition 0 stays the
  * initial build's. */
object StreamingShards {

  /** `docs` must carry (doc_id, text). */
  def run(docs: DataFrame, dir: String, nShards: Int, checkpoint: String,
          triggerMs: Long = 100L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.llm.TrainingShards.appendTrainingShards(
            batch, dir, nShards, batchId + 1L)
        ()
      }.start()
}
