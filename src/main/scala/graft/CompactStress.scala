package graft

import graft.llm.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-files read-amplification measurement behind the artifact
  * compaction work: drive the appendable dedup artifact and the
  * appendable IVF index through ≥100 tiny maintenance batches (the
  * "one partition per streaming micro-batch, forever" shape a daily
  * maintainer produces), measure a real consumer's wall clock and the
  * file/partition counts, compact, re-measure, and assert the consumer's
  * ANSWERS are identical before/after. A diagnostic main like
  * [[RecallProbe]] — measurements, not pipeline code.
  *
  * Usage: CompactStress [sfDir]; writes COMPACT_LOCAL.json
  * (COMPACT_OUT overrides). `COMPACT_BATCHES` overrides the batch count
  * (default 100).
  */
object CompactStress {

  private def filesUnder(dir: String): Int = {
    val d = new java.io.File(dir)
    if (!d.exists()) 0
    else if (d.isFile) (if (d.getName.endsWith(".parquet")) 1 else 0)
    else d.listFiles().map(f => filesUnder(f.getPath)).sum
  }

  private def medianMs(reps: Int)(body: => Unit): Double = {
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
    }.sorted
    times(times.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.01")
    val nBatches = sys.env.getOrElse("COMPACT_BATCHES", "100").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

    // ---- IVF index: 1 build + nBatches appends of ~1% each -------------
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(col("vec_id") >= 50).localCheckpoint(true)
    val queries = emb.filter(col("vec_id") < 50)
    val idx = tmp("graft-cstress-ivf")
    Similarity.writeIvfIndexSized(corpus, idx)
    (1 to nBatches).foreach { b =>
      Similarity.appendIvfIndex(
        corpus.filter(col("vec_id") % nBatches === b % nBatches)
          .select((col("vec_id") + 1000000L * b).as("vec_id"),
            col("embedding")),
        idx, ingestBatch = b.toLong)
    }
    def topkRows() = Similarity.ivfTopKAgainstIndexSized(queries, idx, 10)
      .collect().map(_.toString).sorted.toSeq
    val ivfFilesBefore = filesUnder(s"$idx/cells")
    val ivfBefore = medianMs(3)(topkRows())
    val ivfAnswer = topkRows()
    // explicit watermark: this harness ran every append synchronously, so
    // batch nBatches IS durably committed (the no-arg default excludes
    // the newest batch because a streaming maintainer's newest may be torn)
    Similarity.compactIvfIndex(spark, idx, upTo = nBatches.toLong)
    val ivfFilesAfter = filesUnder(s"$idx/cells")
    val ivfAfter = medianMs(3)(topkRows())
    require(topkRows() == ivfAnswer, "IVF answers changed across compaction")
    System.err.println(
      f"[compact] ivf: files $ivfFilesBefore -> $ivfFilesAfter, topk ms $ivfBefore%.0f -> $ivfAfter%.0f")

    // ---- dedup artifact: 1 build + nBatches appends ---------------------
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint(true)
    val art = tmp("graft-cstress-dedup")
    Dedup.writeDedupArtifactHashed(d.filter(col("doc_id") % 2 === 0), art, 0.4)
    (1 to nBatches).foreach { b =>
      // residue over doc_id div 2: the odd ids' halves cover every
      // residue class, so EVERY batch carries rows — a residue over the
      // raw id contradicts the %2 parity filter for half the batches and
      // would make the "100 maintenance batches" measurement actually
      // ~50 (review-caught)
      Dedup.appendDedupArtifact(
        d.filter(col("doc_id") % 2 === 1)
          .filter(pmod(expr("doc_id div 2"), lit(nBatches.toLong)) === b % nBatches)
          .select((col("doc_id") + 1000000L * b).as("doc_id"),
            col("source"), col("text")),
        art, ingestBatch = b.toLong)
    }
    // the consumer: a full scan of the per-document parts (what every
    // stored-label report starts from)
    def scanRows() = Seq("shingles", "bands", "counts", "nodes").map(p =>
      spark.read.parquet(s"$art/$p").count()).sum
    val dedupFilesBefore = Seq("shingles", "bands", "counts", "nodes")
      .map(p => filesUnder(s"$art/$p")).sum
    val dedupRowsBefore = scanRows()
    val dedupBefore = medianMs(3)(scanRows())
    Dedup.compactDedupArtifact(spark, art, upTo = nBatches.toLong)
    val dedupFilesAfter = Seq("shingles", "bands", "counts", "nodes")
      .map(p => filesUnder(s"$art/$p")).sum
    val dedupAfter = medianMs(3)(scanRows())
    require(scanRows() == dedupRowsBefore, "dedup rows changed across compaction")
    System.err.println(
      f"[compact] dedup: files $dedupFilesBefore -> $dedupFilesAfter, scan ms $dedupBefore%.0f -> $dedupAfter%.0f")

    val json =
      s"""{"metric":"compaction","n_batches":$nBatches,"sf":"$sfDir",""" +
        s""""ivf_files_before":$ivfFilesBefore,"ivf_files_after":$ivfFilesAfter,""" +
        f""""ivf_topk_ms_before":$ivfBefore%.1f,"ivf_topk_ms_after":$ivfAfter%.1f,""" +
        s""""dedup_files_before":$dedupFilesBefore,"dedup_files_after":$dedupFilesAfter,""" +
        f""""dedup_scan_ms_before":$dedupBefore%.1f,"dedup_scan_ms_after":$dedupAfter%.1f}"""
    println(json)
    Util.writeJson("COMPACT_OUT", "COMPACT_LOCAL.json", json)
    Seq(idx, art).foreach { p =>
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
