package graft.streaming

import graft.sources.JsonlDocs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** End-to-end streaming corpus ingest: watch a directory for JSONL files,
  * decode with the [[JsonlDocs]] quarantine contract, gate each document
  * through the stateless curation signals, and fan out to a
  * lang-partitioned parquet corpus plus a dead-letter sink — the
  * ingestion shape of a training-data pipeline, assembled from the same
  * pure transforms the batch (oracle-checked) path uses.
  *
  * Scale/semantics notes:
  *  - The file source discovers new files per trigger and never reprocesses
  *    a seen file (checkpointed log) — ingest is incremental by
  *    construction; `maxFilesPerTrigger` bounds a catch-up burst.
  *  - One decode pass feeds BOTH sinks: foreachBatch persists the batch,
  *    splits good/quarantine, writes each, unpersists. Two writeStreams
  *    would decode every line twice.
  *  - In-batch exact-dup keeping is first-by-doc_id on the 8-byte content
  *    hash; CROSS-batch dedup needs either an event-time watermark
  *    ([[graft.llm.TextAnalysis.streamingCurate]]'s
  *    dropDuplicatesWithinWatermark when a `ts` exists) or the batch
  *    dedup pipeline over the accumulated corpus — per-batch keeping is
  *    what a stream can decide without unbounded state.
  *  - Appending per-batch output is exactly-once via the file sink's
  *    transaction log (same guarantee class as the CDR pipeline's
  *    partitioned sink, SURVEY I3).
  */
object CorpusIngest {

  /** Streaming twin of [[JsonlDocs.read]] — same blank-line drop, same
    * from_json quarantine decode, over a file-source text stream. */
  def jsonlStream(spark: SparkSession, inDir: String,
                  maxFilesPerTrigger: Int = 100): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(inDir)
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), JsonlDocs.schema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record")).as("j"))
      .select(col("j.*"))

  /** Stateless curation gates + in-batch exact-dup keeper election over a
    * decoded batch; returns the gated frame with `keep`. Pure function —
    * reused identically by tests and the live stream. */
  def gate(batch: DataFrame, qualityThreshold: Double = 0.45): DataFrame = {
    val sig = graft.llm.TextAnalysis.signals(batch)
    val keeperWin = org.apache.spark.sql.expressions.Window
      .partitionBy(xxhash64(col("text"))).orderBy(col("doc_id").asc)
    sig
      .withColumn("lang_ok", col("predicted_lang") === col("lang"))
      .withColumn("quality_ok", round(col("quality_score"), 6) >= qualityThreshold)
      .withColumn("not_repetitive", !col("is_repetitive"))
      .withColumn("is_keeper", row_number().over(keeperWin) === 1)
      .withColumn("keep", col("lang_ok") && col("quality_ok") &&
        col("not_repetitive") && col("is_keeper"))
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("lang_ok"), col("quality_ok"), col("not_repetitive"),
        col("is_keeper"), col("keep"))
  }

  /** Start the ingest: JSONL in `inDir` → curated lang-partitioned parquet
    * in `outDir` (kept docs only) + raw corrupt lines in `quarantineDir`. */
  def run(spark: SparkSession, inDir: String, outDir: String,
          quarantineDir: String, checkpoint: String,
          qualityThreshold: Double = 0.45): StreamingQuery =
    jsonlStream(spark, inDir).writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          gate(JsonlDocs.good(batch), qualityThreshold)
            .filter(col("keep"))
            .drop("lang_ok", "quality_ok", "not_repetitive", "is_keeper", "keep")
            .write.mode("append").partitionBy("lang").parquet(outDir)
          JsonlDocs.quarantine(batch)
            .select(col("_corrupt_record").as("value"))
            .write.mode("append").text(quarantineDir)
        } finally batch.unpersist()
        ()
      }
      .start()
}
