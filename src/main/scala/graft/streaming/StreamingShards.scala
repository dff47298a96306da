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

  /** `docs` must carry (doc_id, text). `nShards <= 0` sizes each batch's
    * shard count from its own payload bytes
    * ([[graft.llm.TrainingShards.shardCountFor]]) — the one-row stats agg
    * below replaces the old `batch.isEmpty` probe (same single action per
    * micro-batch) AND stops a small increment from minting a fixed count
    * of near-empty containers. */
  def run(docs: DataFrame, dir: String, nShards: Int, checkpoint: String,
          triggerMs: Long = 100L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions._
        // persist: the stats probe and the container write would each
        // re-evaluate the micro-batch source otherwise (the CorpusIngest
        // convention); with a FIXED nShards the byte sum is unused, so
        // the probe degrades to the count alone
        batch.persist()
        try {
          val st =
            if (nShards > 0) batch.agg(count(lit(1)), lit(0L)).head()
            else batch.agg(count(lit(1)),
              coalesce(sum(octet_length(col("text"))), lit(0L))).head()
          if (st.getLong(0) > 0L) {
            val shards =
              if (nShards > 0) nShards
              else graft.llm.TrainingShards.shardCountFor(
                st.getLong(1), st.getLong(0))
            graft.llm.TrainingShards.appendTrainingShards(
              batch, dir, shards, batchId + 1L)
          }
        } finally batch.unpersist()
        ()
      }.start()

  /** The packed-token store's maintainer — every micro-batch folds in as
    * new packs/containers tokenized by the STORE's OWN tokenizer
    * ([[graft.llm.TrainingShards.appendPackedTokenShards]]: stored merges
    * replayed, vocab extended deterministically), so a training job can
    * consume byte-stable token-id shards while the corpus grows. Same
    * exactly-once convention: batch N's pack/shard bases derive from
    * manifest rows < N+1, replays rewrite identical files. */
  def runPacked(docs: DataFrame, dir: String, nShards: Int,
                checkpoint: String, triggerMs: Long = 100L,
                autoCompactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import org.apache.spark.sql.functions._
        // auto-compaction of the per-batch METADATA parts (spans + vocab;
        // the manifest is one coalesced file per batch and deliberately
        // not compactable — compactPackedMetadata's scaladoc): batches
        // ≤ batchId are checkpoint-committed, the in-flight partition is
        // batchId + 1 (see Maintenance for the contract)
        if (autoCompactEvery > 0)
          Maintenance.autoCompact(batch.sparkSession,
            Seq(s"$dir/spans", s"$dir/tokenizer/vocab"),
            autoCompactEvery, upTo = batchId)(
            graft.llm.TrainingShards.compactPackedMetadata(
              batch.sparkSession, dir, _))
        // persist: the packed append evaluates the batch several times
        // (word distinct, tokenize explode, prefix-sum bounds, container
        // write) — never re-read the micro-batch source for each
        batch.persist()
        try {
          if (batch.agg(count(lit(1))).head().getLong(0) > 0L)
            graft.llm.TrainingShards.appendPackedTokenShards(
              batch, dir, nShards, batchId + 1L)
        } finally batch.unpersist()
        ()
      }.start()
}
