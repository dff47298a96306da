package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dumps `explain("formatted")` for the PACKED-STORE WRITER's container
  * pass — the plan the bench rows pay inside writePackedTokenShards,
  * which the registry queries' returned (read-back) DataFrames don't
  * show. Emits BOTH forms so plans/r14 carries the before/after evidence:
  * the r13 per-token chain (tokenIdSeqs → window → per-token pack groupBy
  * → payload encode) and the r14 per-document-array chain
  * (docTokenArrays → segment slices → per-pack concat).
  * Usage: OptPlanDump [sfDir] [outDir]. */
object OptPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/root/repo/plans/r14")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.configure(spark)
    val docs = Tables.documents(spark, sfDir)
    val (_, words) = llm.BpeTrainer.train(docs, llm.BpeTrainer.MergeSteps)
    val wordSyms = llm.BpeTrainer.wordSymsOf(words)
    val vocab = llm.BpeTrainer.vocabOf(wordSyms)
    val bounds = operators.PrefixSum.sampleBoundaries(
      docs.select(col("doc_id")), operators.PrefixSum.defaultBuckets(docs))
    val budget = llm.TrainingShards.PackedBudget
    val nShards = llm.TrainingShards.PackedShardCount
    val counts = llm.BpeTrainer.docTokenCountsFrom(docs, wordSyms)
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val pw = new PrintWriter(new File(s"$outDir/$name"))
      pw.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      pw.close()
      println(s"wrote $outDir/$name")
    }
    // BEFORE: per-token rows — toks chain + per-doc window + per-token
    // pack groupBy feeding the payload encode + shard exchange
    val toks = llm.BpeTrainer.tokenIdSeqsFrom(docs, wordSyms, vocab)
    val layoutBefore = llm.TrainingShards.packLayoutFromToks(
      toks, budget, bounds, counts)
    dump("packed_writer_entries_before.txt",
      llm.TrainingShards.containerWritePlan(
        llm.TrainingShards.withLayout(
          llm.TrainingShards.packPayloads(layoutBefore.packRows)
            .select(col("pack_seq").as("entry_id"), col("payload")),
          nShards, 0L)))
    // AFTER: per-document arrays — docTokenArrays + segment slices +
    // per-pack concat feeding the same payload encode + shard exchange
    val plan = llm.TrainingShards.packPlanFromCounts(counts, budget, bounds)
    dump("packed_writer_entries_after.txt",
      llm.TrainingShards.containerWritePlan(
        llm.TrainingShards.withLayout(
          llm.TrainingShards.packPayloadsFromDocArrays(
            llm.BpeTrainer.docTokenArrays(docs, wordSyms, vocab), plan, budget)
            .select(col("pack_seq").as("entry_id"), col("payload")),
          nShards, 0L)))
    spark.stop()
  }
}
