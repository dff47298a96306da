package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase-level wall-clock attribution for the bench's heaviest rows — the
  * measurement harness behind OPTIMIZATION_r14.md (guide §1: measure first,
  * isolate with the noop sink). Times each stage of the packed-store build
  * and the dedup-cluster chain in the SAME session shape as [[Bench]]
  * (local[$SPARK_GRAFT_CPUS], AQE on, shuffle.partitions = cpus), so the
  * numbers decompose the bench rows rather than a different runtime.
  * Usage: OptProbe [sfDir] — prints one `phase  seconds` line per stage.
  */
object OptProbe {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def tmpDir(): String =
      java.nio.file.Files.createTempDirectory("graft-optprobe").toString

    val docs = Tables.documents(spark, sfDir)
    time("docs.count warmup")(docs.count())

    // ---- BPE train micro: per-step pair-statistics floor ----
    locally {
      val w0 = docs.select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) >= 1)
        .groupBy("word").agg(count(lit(1)).as("f"))
        .withColumn("syms", expr(
          "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      val ck = time("train.wordFreq+ckpt")(w0.localCheckpoint(true))
      println(s"[probe] word table rows: ${ck.count()}, partitions: ${ck.rdd.getNumPartitions}")
      def pairJob(w: DataFrame): Unit = {
        w.filter(size(col("syms")) >= 2)
          .select(col("f"), explode(expr(
            "transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS a, syms[i] AS b))"))
            .as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("f")).as("cnt"))
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(1).collect()
      }
      time("train.pairJob #1")(pairJob(ck))
      time("train.pairJob #2")(pairJob(ck))
      time("train.pairJob #3")(pairJob(ck))
      time("train.ckpt-only job")(ck.localCheckpoint(true))
    }

    // ---- packed-store build, phase by phase (doc_shards_store_build) ----
    val (merges, words) = time("bpe.train(k=6)")(llm.BpeTrainer.train(docs, 6))
    val wordSyms = time("bpe.wordSymsOf (checkpoint)")(llm.BpeTrainer.wordSymsOf(words))
    val vocab = llm.BpeTrainer.vocabOf(wordSyms)
    time("bpe.vocab materialize")(noop(vocab))
    val toks = llm.BpeTrainer.tokenIdSeqsFrom(docs, wordSyms, vocab)
    time("bpe.tokenIdSeqs materialize")(noop(toks))
    time("counts via toks.groupBy")(noop(
      toks.groupBy("doc_id", "source").agg(count(lit(1)).as("n_tokens"))))
    val bounds = time("prefixsum.sampleBoundaries")(
      operators.PrefixSum.sampleBoundaries(docs.select(col("doc_id")),
        operators.PrefixSum.defaultBuckets(docs)))
    time("writePackedTokenShards TOTAL") {
      llm.TrainingShards.writePackedTokenShards(docs, tmpDir(),
        llm.TrainingShards.PackedShardCount, llm.BpeTrainer.MergeSteps,
        llm.TrainingShards.PackedBudget)
    }
    locally {
      val out = tmpDir()
      time("writePackedTokenShards TOTAL(2)") {
        llm.TrainingShards.writePackedTokenShards(docs, out,
          llm.TrainingShards.PackedShardCount, llm.BpeTrainer.MergeSteps,
          llm.TrainingShards.PackedBudget)
      }
      time("readPackedTokenShards")(noop(
        llm.TrainingShards.readPackedTokenShards(spark, out)))
      time("readManifest")(noop(llm.TrainingShards.readManifest(spark, out)))
    }

    // ---- dedup family kernel (doc_dedup_clusters and its consumers) ----
    time("dedup.vocab")(noop(llm.Dedup.vocab(llm.Dedup.tokenized(docs))))
    time("dedup.shingleIds+ckpt")(
      llm.Dedup.shingleIds(llm.Dedup.tokenized(docs)).localCheckpoint(true))
    time("dedup.lshCandidates")(noop(llm.Dedup.lshCandidates(docs, 0)))
    time("dedup.minhashLsh (pairs)")(noop(llm.Dedup.minhashLsh(docs, 0.4)))
    time("dedup.dedupClusters TOTAL")(noop(llm.Dedup.dedupClusters(docs, 0.4)))
    time("dedup.clusterTerms TOTAL")(noop(llm.Dedup.clusterTerms(docs, 0.4, 3)))
    time("dedup.dedupEval TOTAL")(noop(llm.Dedup.dedupEval(docs, 0.4)))

    spark.stop()
  }
}
