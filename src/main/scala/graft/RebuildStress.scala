package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up stress for the packed store's HARD-DELETE REBUILD
  * ([[graft.llm.TrainingShards.rebuildPackedStore]]): replicate the sf
  * documents table ×N (disjoint doc_id ranges — key cardinalities scale
  * like real growth), build a packed store, tombstone ~3% of documents,
  * and measure the three takedown postures side by side:
  *
  *  - the RECORD (addTombstones + activeSpans): what a takedown costs
  *    when zero-weighting suffices — metadata-sized,
  *  - the DEBT measurement (packedStoreDeadFraction): the gate's cost,
  *  - the REBUILD: the corpus-sized escalation, with per-task maxima so
  *    a skew-shaped regression (one task holding the whole decode) shows
  *    up as max_task, not just wall.
  *
  * Integrity is asserted in-run: post-rebuild token mass equals the
  * pre-measured surviving mass, the dead fraction returns to zero, and
  * the manifest-derived locations match the decoded files. Writes
  * REBUILD_LOCAL.json (STRESS_OUT-style override: REBUILD_OUT).
  *
  * Usage: RebuildStress [sfDir] [factor]
  */
object RebuildStress {
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
    import graft.llm.TrainingShards

    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = base.agg(max("doc_id")).head().getLong(0) + 1L
    val stressDir = s"/tmp/graft-rebuild-x$factor"
    val copies = spark.range(factor).select(col("id").as("copy"))
    // repartition before write — the ScaleStress scan-parallelism lesson:
    // the downstream tokenize fan-out must not ride a one-file scan
    base.crossJoin(copies)
      .withColumn("doc_id", col("doc_id") + col("copy") * maxId)
      .drop("copy")
      .repartition(cpus * 2)
      .write.mode("overwrite").parquet(s"$stressDir/docs.parquet")
    val docs = spark.read.parquet(s"$stressDir/docs.parquet")
    val nDocs = docs.count()

    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          maxTask.updateAndGet(m => math.max(m, t.taskInfo.duration))
          ()
        }
      })
    def timed[T](what: String)(f: => T): (T, Double, Long) = {
      maxTask.set(0)
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[rebuild-stress] $what%-22s $dt%8.2f s (max task ${maxTask.get()} ms)")
      (r, dt, maxTask.get())
    }

    val store = s"$stressDir/store"
    // shard count ∝ corpus (the writer's own sizing rule would apply at a
    // real deployment; fixed-per-factor keeps the container size constant
    // across factors so walls compare)
    val nShards = 8 * factor
    val (_, tBuild, mtBuild) = timed(s"packed build x$factor")(
      TrainingShards.writePackedTokenShards(docs, store, nShards,
        graft.llm.BpeTrainer.MergeSteps, 512))

    // the RECORD posture: a ~3% takedown lands as metadata
    val doomed = docs.filter(col("doc_id") % 37 === 0).select("doc_id")
    val (_, tTomb, _) = timed("tombstone record")(
      TrainingShards.addTombstones(spark, store, doomed, ingestBatch = 1L))
    val ((nActive, totalTok, deadTok), tActive, _) = timed("active-span feed") {
      val n = TrainingShards.activeSpans(spark, store).count()
      val m = TrainingShards.readPackedSpans(spark, store)
        .join(broadcast(TrainingShards.readTombstones(spark, store)
          .withColumn("dead", lit(1))), Seq("doc_id"), "left")
        .agg(sum(col("n_tokens")),
          coalesce(sum(when(col("dead") === 1, col("n_tokens"))), lit(0L)))
        .head()
      (n, m.getLong(0), m.getLong(1))
    }
    val (deadFrac, tGate, _) = timed("debt gate")(
      TrainingShards.packedStoreDeadFraction(spark, store))

    // the REBUILD posture: every surviving byte rewritten
    val (_, tRebuild, mtRebuild) = timed(s"hard rebuild x$factor")(
      TrainingShards.rebuildPackedStore(spark, store, nShards))
    val ((survTok, locOk), tVerify, _) = timed("post-rebuild verify") {
      val s = spark.read.parquet(s"$store/manifest")
        .agg(sum(col("n_bytes"))).head().getLong(0) / 4L
      val a = TrainingShards.packLocations(spark, store)
        .count()
      val b = TrainingShards.readPackedTokenShards(spark, store)
        .select(col("pack_seq"), col("shard"), col("pos"))
        .join(TrainingShards.packLocations(spark, store),
          Seq("pack_seq", "shard", "pos"))
        .count()
      (s, a == b)
    }
    require(survTok == totalTok - deadTok,
      s"rebuild lost tokens: $survTok != $totalTok - $deadTok")
    require(TrainingShards.packedStoreDeadFraction(spark, store) == 0.0,
      "rebuild left tombstone debt")
    require(locOk, "manifest-derived locations != decoded files after rebuild")

    val json = s"""{"metric":"rebuild_x$factor","docs":$nDocs,"n_shards":$nShards,"build_sec":$tBuild,"build_max_task_ms":$mtBuild,"tombstone_sec":$tTomb,"active_feed_sec":$tActive,"active_spans":$nActive,"gate_sec":$tGate,"dead_frac":$deadFrac,"total_tokens":$totalTok,"dead_tokens":$deadTok,"rebuild_sec":$tRebuild,"rebuild_max_task_ms":$mtRebuild,"verify_sec":$tVerify,"rebuild_over_build":${tRebuild / tBuild}}"""
    println(json)
    Util.writeJson("REBUILD_OUT", "REBUILD_LOCAL.json", json)
    spark.stop()
  }
}
