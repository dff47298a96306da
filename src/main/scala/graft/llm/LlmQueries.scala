package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal) — filled in module by module; each sub-object
  * contributes (queries, oracle) pairs. */
object LlmQueries {
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Dedup.queries ++ Similarity.queries ++ TextAnalysis.queries ++
      Multimodal.queries ++ Sketches.queries ++ BpeTrainer.queries ++
      WarcIngest.queries ++ UrlCuration.queries ++ UnigramLm.queries ++
      LinearTrainer.queries ++ RecordLinkage.queries ++ PrefData.queries ++
      TrainingShards.queries
  def oracle: Map[String, String] =
    Dedup.oracle ++ Similarity.oracle ++ TextAnalysis.oracle ++
      Multimodal.oracle ++ Sketches.oracle ++ BpeTrainer.oracle ++
      WarcIngest.oracle ++ UrlCuration.oracle ++ UnigramLm.oracle ++
      LinearTrainer.oracle ++ RecordLinkage.oracle ++ PrefData.oracle ++
      TrainingShards.oracle
}
