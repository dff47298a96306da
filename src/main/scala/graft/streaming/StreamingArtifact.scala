package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuously-maintained near-dup artifact: every micro-batch of newly
  * ingested documents is folded into the stored hashed dedup artifact
  * ([[graft.llm.Dedup.appendDedupArtifact]]), so batch N+1's mining sees
  * every document batch N delivered — the streaming form of "the corpus
  * grows daily and the artifact grows with it", with per-batch cost
  * bounded by the increment (the corpus is read, never re-shingled,
  * never rewritten).
  *
  * Exactly-once without a ledger: the artifact's per-document parts are
  * partitioned by `ingest_batch`, and each batch writes its own partition
  * with dynamic partition overwrite — a crash between the write and the
  * checkpoint commit replays the SAME batch id with the SAME rows
  * (Structured Streaming's replay contract), which rewrites the partition
  * bit-identically and recomputes the same derived pair/cluster tables.
  * Spec-pinned: stream-of-batches ≡ one-shot rebuild, and a forced replay
  * changes nothing (Round10OpsSpec).
  *
  * The artifact must exist before the stream starts
  * ([[graft.llm.Dedup.writeDedupArtifactHashed]]; an EMPTY seed corpus is
  * allowed — the first append bootstraps the schema-less partition dirs,
  * spec-pinned in Round11OpsSpec "empty-seed hashed artifact"); stream
  * batch ids map to partitions `batchId + 1` so partition 0 stays the
  * initial build's. */
object StreamingArtifact {

  /** `docs` must carry (doc_id, text). `autoCompactEvery > 0` folds the
    * artifact's committed per-document partitions into one
    * ([[graft.llm.Dedup.compactDedupArtifact]]) whenever more than that
    * many partition dirs have accumulated — the unattended form of the
    * small-files maintenance ([[Maintenance]] documents why the top of a
    * micro-batch satisfies the offline/committed compaction contract:
    * batches ≤ N−1 are checkpoint-committed, this stream is the only
    * writer, and the watermark `batchId` excludes the in-flight batch's
    * partition `batchId + 1`). */
  def run(docs: DataFrame, path: String, checkpoint: String,
          triggerMs: Long = 100L, autoCompactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (autoCompactEvery > 0)
          Maintenance.autoCompact(batch.sparkSession,
            Seq("nodes", "shingles", "bands", "counts").map(p => s"$path/$p"),
            autoCompactEvery, upTo = batchId)(
            graft.llm.Dedup.compactDedupArtifact(batch.sparkSession, path, _))
        if (!batch.isEmpty)
          graft.llm.Dedup.appendDedupArtifact(batch, path, batchId + 1L)
        ()
      }.start()
}
