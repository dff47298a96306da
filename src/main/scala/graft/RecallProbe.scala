package graft

import graft.llm.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}

/** ANN recall measurement harness behind SCALE.md's "recall vs knobs"
  * table: recall@10 against brute force for every ANN variant and its
  * knob settings, over the sf embedding table. A diagnostic main like
  * [[ScaleStress]] — measurements, not pipeline code — so the table is
  * re-runnable per round instead of a one-off scratch script.
  *
  * Usage: RecallProbe [sfDir]; writes RECALL_LOCAL.json (RECALL_OUT
  * overrides).
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
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

    val emb = Tables.embeddings(spark, sfDir)
    val nQ = 50
    val k = 10
    def pairs(df: DataFrame): Set[(Long, Long)] = {
      import spark.implicits._
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    }
    val brute = pairs(Similarity.bruteForceTopK(emb, nQ, k))
    def recall(df: DataFrame): Double =
      math.round(10000.0 * (pairs(df) & brute).size / brute.size) / 10000.0

    // RECALL_ONLY=stored — quick-iteration gate: run ONLY the stored-index
    // section and print (never overwrite RECALL_LOCAL.json with a partial
    // record — the bench's BENCH_ONLY convention).
    val onlyStored = sys.env.get("RECALL_ONLY").contains("stored")

    val rows = if (onlyStored) Seq.empty else Seq(
      "lsh_fam1" -> recall(Similarity.lshTopK(emb, nQ, k)),
      "lsh_fam2" -> recall(Similarity.lshTopKMulti(emb, nQ, k, 2)),
      "lsh_fam4" -> recall(Similarity.lshTopKMulti(emb, nQ, k, 4)),
      "lsh_multiprobe1" -> recall(Similarity.lshTopKMultiprobe(emb, nQ, k, 1)),
      "lsh_multiprobe2" -> recall(Similarity.lshTopKMultiprobe(emb, nQ, k, 2)),
      "lsh_multiprobe4" -> recall(Similarity.lshTopKMultiprobe(emb, nQ, k, 4)),
      "lsh_multiprobe8" -> recall(Similarity.lshTopKMultiprobe(emb, nQ, k, 8)),
      "ivf_np2_plain" -> recall(Similarity.ivfTopK(emb, nQ, k, nprobe = 2)),
      "ivf_np2_kmeans1" -> recall(Similarity.ivfKmeansTopK(emb, nQ, k, nprobe = 2, iters = 1)),
      "ivf_np2_kmeans2" -> recall(Similarity.ivfKmeansTopK(emb, nQ, k, nprobe = 2, iters = 2)),
      "ivf_np2_kmeans3" -> recall(Similarity.ivfKmeansTopK(emb, nQ, k, nprobe = 2, iters = 3)),
      "ivf_np4_plain" -> recall(Similarity.ivfTopK(emb, nQ, k, nprobe = 4)),
      "ivf_np4_kmeans2" -> recall(Similarity.ivfKmeansTopK(emb, nQ, k, nprobe = 4, iters = 2)),
      "ivf_np8_plain" -> recall(Similarity.ivfTopK(emb, nQ, k, nprobe = 8)),
      "ivf_np8_kmeans2" -> recall(Similarity.ivfKmeansTopK(emb, nQ, k, nprobe = 8, iters = 2)),
      // PQ-ADC scans COMPRESSED codes (4 ids vs 64 floats, ~64×): its knob
      // is codebook granularity — smaller codeMod ⇒ more codewords
      "pq_mod61" -> recall(Similarity.pqTopK(emb, nQ, k, codeMod = 61)),
      "pq_mod23" -> recall(Similarity.pqTopK(emb, nQ, k, codeMod = 23)),
      "pq_mod7" -> recall(Similarity.pqTopK(emb, nQ, k, codeMod = 7)),
      // PQ + exact re-rank (FAISS refine): recall is "true neighbor in the
      // PQ top k·refine", the production fix for PQ's coarse ranking; the
      // refine ladder records how fast it converges and what it costs
      // (exact-vector reads per query = k·refine)
      "pq_refine4" -> recall(Similarity.pqRefineTopK(emb, nQ, k, refine = 4)),
      "pq_refine16" -> recall(Similarity.pqRefineTopK(emb, nQ, k, refine = 16)),
      "pq_refine64" -> recall(Similarity.pqRefineTopK(emb, nQ, k, refine = 64)),
      // IVFPQ composes both knobs: nprobe widens the scanned cells, codeMod
      // refines the residual codebook — at equal codeMod vs plain PQ the
      // delta is pure residual-quantization gain
      "ivfpq_np2" -> recall(Similarity.ivfPqTopK(emb, nQ, k, nprobe = 2)),
      "ivfpq_np4" -> recall(Similarity.ivfPqTopK(emb, nQ, k, nprobe = 4)),
      "ivfpq_np8" -> recall(Similarity.ivfPqTopK(emb, nQ, k, nprobe = 8)),
      "ivfpq_np8_mod7" -> recall(Similarity.ivfPqTopK(emb, nQ, k, nprobe = 8, codeMod = 7)),
      // IVF-PQ + exact re-rank: ceiling = the probed cells' coverage (the
      // IVF arm's own recall at the same nprobe) — refine recovers the PQ
      // quantization loss inside it
      "ivfpq_np8_refine16" -> recall(Similarity.ivfPqRefineTopK(emb, nQ, k, nprobe = 8, refine = 16)),
      "ivfpq_np8_refine64" -> recall(Similarity.ivfPqRefineTopK(emb, nQ, k, nprobe = 8, refine = 64)))
    rows.foreach { case (n, r) => System.err.println(f"[recall] $n%-18s $r%.4f") }

    // The sized default path (ivfSizedParams): recall at the derived knobs
    // must clear the stated target — this row IS the gate the sized
    // defaults ship behind — plus the measured cost/recall frontier at the
    // sized nlist: scan fraction = candidate pairs / (nQ × corpus), so
    // every recall number carries the probe cost it was bought at.
    val nTot = emb.count()
    val corpusN = nTot - nQ
    val (nlist, cmod, sizedNp) = Similarity.ivfSizedParams(nTot, 0.8)
    def scanFrac(np: Int): Double =
      math.round(10000.0 * Similarity.ivfCandidateCount(emb, nQ, cmod, np, 2) /
        (nQ.toDouble * corpusN)) / 10000.0
    val frontierNp =
      (Seq(nlist / 8, nlist / 4, nlist / 2, sizedNp, nlist).map(math.max(1, _))
        ++ Seq(Similarity.ivfSizedParams(nTot, 0.9)._3)).distinct.sorted
    val frontier = if (onlyStored) Seq.empty else frontierNp.flatMap { np =>
      val r = recall(Similarity.ivfKmeansTopK(emb, nQ, k, cmod, np, iters = 2))
      val s = scanFrac(np)
      System.err.println(f"[recall] ivf_sized np=$np%-3d recall=$r%.4f scan=$s%.4f")
      Seq(s"ivf_sized_np${np}" -> r, s"ivf_sized_np${np}_scan" -> s)
    }
    val sizedMeta = if (onlyStored) Seq.empty else Seq(
      "ivf_sized_nlist" -> nlist.toDouble, "ivf_sized_cmod" -> cmod.toDouble,
      "ivf_sized_nprobe" -> sizedNp.toDouble,
      "ivf_sized_target" -> 0.8,
      "ivf_sized" -> recall(Similarity.ivfSizedTopK(emb, nQ, k)))
    sizedMeta.takeRight(1).foreach { case (n, r) =>
      System.err.println(f"[recall] $n%-18s $r%.4f (target 0.8)") }

    // The STORED IVF-PQ serving contract (writeIvfPqIndexSized →
    // ivfPqRefineAgainstIndex at the params the index carries) — the r10
    // verdict's one unmeasured headline claim. The index is built over the
    // corpus side only (an index can't see future queries), then recall is
    // measured (a) at the stored contract exactly, and (b) along the refine
    // ladder at the stored nprobe, so the refine default is anchored to a
    // measured recovery curve, not extrapolated from hand-picked nprobes.
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft-recall-ivfpq").toString
    val corpus = emb.filter(org.apache.spark.sql.functions.col("vec_id") >= nQ)
    val qrs = emb.filter(org.apache.spark.sql.functions.col("vec_id") < nQ)
    Similarity.writeIvfPqIndexSized(corpus, idxDir)
    val prm = spark.read.parquet(s"$idxDir/params").head()
    val storedNp = prm.getAs[Int]("nprobe")
    val storedRefine = prm.getAs[Int]("refine")
    val refineLadder = Seq(4, 16, 32, 64).flatMap { rf =>
      val r = recall(Similarity.ivfPqRefineAgainstIndex(qrs, idxDir, k,
        refineOverride = Some(rf)))
      System.err.println(f"[recall] ivfpq_sized refine=$rf%-3d recall=$r%.4f (np=$storedNp)")
      Seq(s"ivfpq_sized_refine$rf" -> r)
    }
    val storedContract = recall(Similarity.ivfPqRefineAgainstIndex(qrs, idxDir, k))
    System.err.println(
      f"[recall] ivfpq_sized stored contract np=$storedNp refine=$storedRefine recall=$storedContract%.4f (target 0.8)")
    // the coverage ceiling at the stored nprobe: refine large enough that
    // every ADC candidate in the probed cells is exactly re-ranked — what
    // the refine stage can at best recover to
    val ceiling = recall(Similarity.ivfPqRefineAgainstIndex(qrs, idxDir, k,
      refineOverride = Some((corpusN / k + 1).toInt)))
    System.err.println(f"[recall] ivfpq_sized ceiling (refine-all) recall=$ceiling%.4f")
    val ivfpqSized = Seq(
      "ivfpq_sized_nprobe" -> storedNp.toDouble,
      "ivfpq_sized_refine" -> storedRefine.toDouble,
      "ivfpq_sized_target" -> 0.8,
      "ivfpq_sized" -> storedContract,
      "ivfpq_sized_ceiling" -> ceiling) ++ refineLadder

    // r12: recall DRIFT of an APPENDED index — the measurement behind
    // rebuildFactor = 2. Build the sized index on HALF the corpus, fold
    // the other half in by append (assigned against the stale
    // half-corpus centroids — exactly what ivf(Pq)IndexNeedsRebuild's
    // 2× trigger tolerates right up to its firing point), then measure
    // recall at the stored contract over the SAME full corpus a
    // rebuilt-at-N index serves. The appended-vs-rebuilt gap at 2× IS
    // the price the trigger accepts; if appended misses the target, the
    // factor must shrink.
    import org.apache.spark.sql.functions.col
    val half = corpus.filter(col("vec_id") % 2 === 0)
    val rest = corpus.filter(col("vec_id") % 2 =!= 0)
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val (ivfApp, ivfReb) = (tmp("graft-recall-ivf-app"), tmp("graft-recall-ivf-reb"))
    Similarity.writeIvfIndexSized(half, ivfApp)
    Similarity.appendIvfIndex(rest, ivfApp)
    Similarity.writeIvfIndexSized(corpus, ivfReb)
    val rIvfApp = recall(Similarity.ivfTopKAgainstIndexSized(qrs, ivfApp, k))
    val rIvfReb = recall(Similarity.ivfTopKAgainstIndexSized(qrs, ivfReb, k))
    // assert the trigger against the ACTUAL growth ratio of this split —
    // an even/odd split of a small or odd-sized corpus is not exactly 2×,
    // and a probe must report, not abort, on such corpora (review-caught)
    val buildN = half.count().toDouble
    val ratio = (buildN + rest.count()) / buildN
    require(Similarity.ivfIndexNeedsRebuild(spark, ivfApp, rebuildFactor = ratio - 0.05)
      && !Similarity.ivfIndexNeedsRebuild(spark, ivfApp, rebuildFactor = ratio + 0.05),
      f"drift trigger must fire exactly around ${ratio}%.3fx build_n at this split")
    val (pqApp, pqReb) = (tmp("graft-recall-pqa"), tmp("graft-recall-pqr"))
    Similarity.writeIvfPqIndexSized(half, pqApp)
    Similarity.appendIvfPqIndex(rest, pqApp)
    Similarity.writeIvfPqIndexSized(corpus, pqReb)
    val rPqApp = recall(Similarity.ivfPqRefineAgainstIndex(qrs, pqApp, k))
    val rPqReb = recall(Similarity.ivfPqRefineAgainstIndex(qrs, pqReb, k))
    System.err.println(f"[recall] ivf_sized appended@2x=$rIvfApp%.4f rebuilt=$rIvfReb%.4f")
    System.err.println(f"[recall] ivfpq_sized appended@2x=$rPqApp%.4f rebuilt=$rPqReb%.4f")
    val appendDrift = Seq(
      "ivf_sized_appended_2x" -> rIvfApp,
      "ivf_sized_rebuilt_at_2x" -> rIvfReb,
      "ivfpq_sized_appended_2x" -> rPqApp,
      "ivfpq_sized_rebuilt_at_2x" -> rPqReb)
    // persist the MEASURED recall with the appended indexes (the r12
    // verdict's "record measured recall in the params" item): after this,
    // the rebuild trigger gates on the measurement itself rather than the
    // growth-ratio extrapolation — asserted right here
    val ivfN = spark.read.parquet(s"$ivfApp/cells").count()
    Similarity.recordMeasuredRecall(spark, ivfApp, rIvfApp, ivfN)
    val pqN = spark.read.parquet(s"$pqApp/vectors").count()
    Similarity.recordMeasuredRecall(spark, pqApp, rPqApp, pqN)
    require(Similarity.ivfIndexNeedsRebuild(spark, ivfApp) == (rIvfApp < 0.8),
      "IVF rebuild gate must follow the recorded measurement")
    require(Similarity.ivfPqIndexNeedsRebuild(spark, pqApp) == (rPqApp < 0.8),
      "IVF-PQ rebuild gate must follow the recorded measurement")
    System.err.println(f"[recall] measured-gate ivf=${rIvfApp < 0.8} ivfpq=${rPqApp < 0.8} (recorded at n=$ivfN/$pqN)")

    // the probe's temp indexes are measurement scratch, not artifacts —
    // delete them (review-caught leak)
    Seq(idxDir, ivfApp, ivfReb, pqApp, pqReb).foreach { d =>
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      catch { case _: Throwable => () }
    }

    val json = (rows ++ sizedMeta ++ frontier ++ ivfpqSized ++ appendDrift)
      .map { case (n, r) => "\"" + n + "\":" + r }
      .mkString(s"""{"metric":"recall_at_$k","n_queries":$nQ,"sf":"$sfDir",""", ",", "}")
    println(json)
    if (!onlyStored) Util.writeJson("RECALL_OUT", "RECALL_LOCAL.json", json)
    spark.stop()
  }
}
