package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuously-maintained takedown record for the packed token-shard
  * store: takedown REQUESTS (doc ids) arrive as a stream — a legal/compliance
  * queue is exactly that — and each micro-batch folds into the store's
  * tombstone part ([[graft.llm.TrainingShards.addTombstones]]), so the
  * loss-mask feed ([[graft.llm.TrainingShards.activeSpans]]) reflects every
  * delivered request without a byte of shipped-container rewrite.
  *
  * Exactly-once by the artifact convention ([[StreamingArtifact]]): the
  * tombstone part is `ingest_batch`-partitioned and each batch
  * dynamic-overwrites its own partition, so a crash-replayed batch id
  * rewrites bit-identically. Takedown batch ids are their OWN sequence
  * (independent of corpus ingest batches) — which is exactly why
  * [[graft.llm.TrainingShards.compactTombstones]] watermarks from this part
  * rather than the store's manifest. Stream batch ids map to partitions
  * `batchId + 1`, reserving 0 for any ad-hoc pre-stream takedown. */
object StreamingTombstones {

  /** `requests` must carry `doc_id`. */
  def run(requests: DataFrame, dir: String, checkpoint: String,
          triggerMs: Long = 100L): StreamingQuery =
    requests.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.llm.TrainingShards.addTombstones(
            batch.sparkSession, dir, batch, batchId + 1L)
        ()
      }.start()
}
