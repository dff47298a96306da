package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuously-maintained ANN index: every micro-batch of newly ingested
  * vectors is folded into a stored sized IVF (or IVF-PQ) index
  * ([[graft.llm.Similarity.appendIvfIndex]] /
  * [[graft.llm.Similarity.appendIvfPqIndex]]) — the vector-side twin of
  * [[StreamingArtifact]]: the corpus grows daily and the serving index
  * grows with it, per-batch cost bounded by the increment (assignment and
  * residual encode run against the STORED broadcast centroid/codebook
  * tables; the indexed corpus is never read).
  *
  * Exactly-once without a ledger, the same convention as the dedup
  * artifact: per-vector parts are `ingest_batch`-partitioned and each
  * batch dynamically overwrites its own partition, so a crash-replayed
  * batch id rewrites bit-identically. Centroid drift is the maintainer's
  * rebuild signal — poll [[graft.llm.Similarity.ivfIndexNeedsRebuild]]
  * between batches; appends stay CORRECT at any growth, recall degrades
  * gracefully until the rebuild.
  *
  * The index must exist before the stream starts
  * ([[graft.llm.Similarity.writeIvfIndexSized]] /
  * `writeIvfPqIndexSized`); stream batch ids map to partitions
  * `batchId + 1` so partition 0 stays the initial build's. */
object StreamingAnnIndex {

  /** `vecs` must carry (vec_id, embedding). `autoCompactEvery > 0` folds
    * the index's committed per-vector partitions into one
    * ([[graft.llm.Similarity.compactIvfIndex]] / `compactIvfPqIndex`)
    * whenever more than that many partition dirs have accumulated — see
    * [[Maintenance]] for why the top of a micro-batch satisfies the
    * offline/committed compaction contract. */
  def run(vecs: DataFrame, path: String, checkpoint: String,
          pq: Boolean = false, triggerMs: Long = 100L,
          autoCompactEvery: Int = 0): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (autoCompactEvery > 0)
          Maintenance.autoCompact(batch.sparkSession,
            if (pq) Seq(s"$path/codes", s"$path/vectors")
            else Seq(s"$path/cells"),
            autoCompactEvery, upTo = batchId)(u =>
            if (pq) graft.llm.Similarity.compactIvfPqIndex(
              batch.sparkSession, path, u)
            else graft.llm.Similarity.compactIvfIndex(
              batch.sparkSession, path, u))
        if (!batch.isEmpty) {
          if (pq) graft.llm.Similarity.appendIvfPqIndex(batch, path, batchId + 1L)
          else graft.llm.Similarity.appendIvfIndex(batch, path, batchId + 1L)
        }
        ()
      }.start()
}
