package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused ×N scale stress for the two kernel families the r14/r15
  * optimization rounds rewrote — the array-payload packed writer (build +
  * append) and the band-fold MinHash LSH chain — answering the r14
  * verdict's what's-wrong #3: sf0.1 is overhead-bound (most rows run
  * FASTER on 8 cores than 32), so scaling claims for the CHANGED kernels
  * need executed ×N evidence, not plan structure alone.
  *
  * Corpus scaling follows ScaleStress's docsN convention exactly:
  * replicate with disjoint doc_id ranges and per-copy token salt so vocab
  * and shingle cardinality grow with volume like real corpus growth.
  * Output: one JSON line + PACKSTRESS_LOCAL_xN.json (STRESS_OUT overrides).
  *
  * Usage: StressR15 [sfDir] [factor]
  */
object StressR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
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

    def timed[T](what: String)(f: => T): (T, Double) = {
      spark.sparkContext.setJobDescription(what)
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[stress15] $what%-28s $dt%8.2f s")
      spark.sparkContext.setJobDescription(null)
      (r, dt)
    }
    def tmpDir(): String =
      java.nio.file.Files.createTempDirectory("graft-stress15").toString

    val docsBase = Tables.table(spark, sfDir, "documents")
    val maxDoc = docsBase.agg(max("doc_id")).head().getLong(0) + 1
    val copies = spark.range(factor).select(col("id").as("copy"))
    val docsN = docsBase.crossJoin(copies)
      .withColumn("doc_id", col("doc_id") + col("copy") * maxDoc)
      .withColumn("text", when(col("copy") === 0, col("text"))
        .otherwise(concat(col("text"), lit(" c"), col("copy"))))
      .drop("copy")
      .repartition(cpus * 2)
      .localCheckpoint(true)
    val nDocs = docsN.count()

    // the array-payload packed writer: build on 2/3, append 1/3 — the
    // doc_shards_packed_append_roundtrip shape at ×N
    val out = tmpDir()
    val (_, tBuild) = timed(s"packed build x$factor") {
      graft.llm.TrainingShards.writePackedTokenShards(
        docsN.filter(col("doc_id") % 3 =!= 0), out,
        graft.llm.TrainingShards.PackedShardCount,
        graft.llm.BpeTrainer.MergeSteps, graft.llm.TrainingShards.PackedBudget)
    }
    val (_, tAppend) = timed(s"packed append x$factor") {
      graft.llm.TrainingShards.appendPackedTokenShards(
        docsN.filter(col("doc_id") % 3 === 0), out,
        graft.llm.TrainingShards.PackedShardCount)
    }
    val (nPacked, tRead) = timed(s"packed read x$factor") {
      graft.llm.TrainingShards.readPackedTokenShards(spark, out).count()
    }

    // the band-fold LSH chain: candidates and the full verified pair set
    // (candidatesOf rides bandValsOf — the r14 in-row band fold — and the
    // verify join carries the r15 size-ratio prefilter)
    val (nCand, tCand) = timed(s"lsh candidates x$factor") {
      graft.llm.Dedup.lshCandidates(docsN, 1).count()
    }
    val (nPairs, tPairs) = timed(s"minhash pairs x$factor") {
      graft.llm.Dedup.minhashLsh(docsN, 0.4).count()
    }

    val json = s"""{"metric":"packstress_x$factor","factor":$factor,""" +
      s""""n_docs":$nDocs,"build_sec":$tBuild,"append_sec":$tAppend,""" +
      s""""read_sec":$tRead,"n_packed":$nPacked,""" +
      s""""cand_sec":$tCand,"n_cand":$nCand,""" +
      s""""pairs_sec":$tPairs,"n_pairs":$nPairs,"cpus":$cpus,"sf":"$sfDir"}"""
    println(json)
    Util.writeJson("STRESS_OUT", s"PACKSTRESS_LOCAL_x$factor.json", json)
    spark.stop()
  }
}
