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

  /** `vecs` must carry (vec_id, embedding). */
  def run(vecs: DataFrame, path: String, checkpoint: String,
          pq: Boolean = false, triggerMs: Long = 100L): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          if (pq) graft.llm.Similarity.appendIvfPqIndex(batch, path, batchId + 1L)
          else graft.llm.Similarity.appendIvfIndex(batch, path, batchId + 1L)
        }
        ()
      }.start()
}
