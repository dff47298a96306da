package graft

import org.apache.spark.sql.functions._

/** Focused equivalence specs for the round-14 OPTIMIZATION pass: the
  * packed-store writers switched from per-token rows (explode → per-doc
  * row_number window → per-token pack groupBy) to per-document token
  * ARRAYS sliced into pack segments (the optimization-guide §8 "move the
  * payload once" shape), and the pack-layout counts switched to the
  * word-level aggregation. Each spec pins the optimized form bit-identical
  * to the retained reference form on the fixture, so a future edit to
  * either twin that drifts the bytes fails here, not at the oracle. */
class OptR14Spec extends SparkSpec {
  import spark.implicits._
  import graft.llm.{BpeTrainer, TrainingShards}

  private def docs = Tables.documents(spark, sf)
    .select($"doc_id", $"source", $"text")

  test("docTokenArrays == tokenIdSeqsFrom: same per-doc ordered id streams") {
    val (_, words) = BpeTrainer.train(docs, 4)
    val wordSyms = BpeTrainer.wordSymsOf(words)
    val vocab = BpeTrainer.vocabOf(wordSyms)
    val viaRows = BpeTrainer.tokenIdSeqsFrom(docs, wordSyms, vocab)
      .groupBy($"doc_id")
      .agg(max($"source").as("source"),
        transform(sort_array(collect_list(struct($"tidx", $"token_id"))),
          x => x("token_id")).as("tok"))
    val viaArrays = BpeTrainer.docTokenArrays(docs, wordSyms, vocab)
    val a = viaRows.select($"doc_id", $"source", $"tok".cast("string"))
      .collect().map(_.toString).sorted.toSeq
    val b = viaArrays.select($"doc_id", $"source", $"tok".cast("string"))
      .collect().map(_.toString).sorted.toSeq
    assert(a.nonEmpty && a == b)
  }

  test("docTokenCountsFrom == per-token groupBy count") {
    val (_, words) = BpeTrainer.train(docs, 4)
    val wordSyms = BpeTrainer.wordSymsOf(words)
    val vocab = BpeTrainer.vocabOf(wordSyms)
    val viaToks = BpeTrainer.tokenIdSeqsFrom(docs, wordSyms, vocab)
      .groupBy("doc_id", "source").agg(count(lit(1)).as("n_tokens"))
      .collect().map(_.toString).sorted.toSeq
    val viaWords = BpeTrainer.docTokenCountsFrom(docs, wordSyms)
      .collect().map(_.toString).sorted.toSeq
    assert(viaToks.nonEmpty && viaToks == viaWords)
  }

  test("packPayloadsFromDocArrays == packPayloads over packRows: byte-identical packs") {
    val (_, words) = BpeTrainer.train(docs, 4)
    val wordSyms = BpeTrainer.wordSymsOf(words)
    val vocab = BpeTrainer.vocabOf(wordSyms)
    val bounds = graft.operators.PrefixSum.sampleBoundaries(
      docs.select($"doc_id"), 4)
    val budget = 17 // deliberately awkward: packs straddle doc boundaries
    val counts = BpeTrainer.docTokenCountsFrom(docs, wordSyms)
    val reference = TrainingShards.packPayloads(
      TrainingShards.packLayoutFromToks(
        BpeTrainer.tokenIdSeqsFrom(docs, wordSyms, vocab),
        budget, bounds, counts).packRows)
      .as[(Long, Array[Byte])].collect()
      .map { case (p, b) => p -> b.toSeq }.toMap
    val plan = TrainingShards.packPlanFromCounts(counts, budget, bounds)
    val optimized = TrainingShards.packPayloadsFromDocArrays(
        BpeTrainer.docTokenArrays(docs, wordSyms, vocab), plan, budget)
      .as[(Long, Array[Byte])].collect()
      .map { case (p, b) => p -> b.toSeq }.toMap
    assert(reference.nonEmpty && reference == optimized)
  }
}
