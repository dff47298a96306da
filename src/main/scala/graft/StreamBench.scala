package graft

import java.nio.file.Files

import graft.cdr.CdrTables
import graft.streaming.{CdrStreamJob, CsvCodec, DimensionCache}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming throughput benchmark: drives the full two-branch enrichment
  * pipeline (decode → branch → broadcast joins → argmax dedup → partitioned
  * parquet sink) through the foreachBatch runner over MemoryStream
  * micro-batches and reports end-to-end rows/s.
  *
  * Context: the reference's generator feeds it 10 rows/s (flink.conf:7) —
  * its pipeline is provisioned for that envelope. This measures our engine's
  * single-node ceiling on the same logical pipeline.
  *
  * Usage: StreamBench [sfDir] [batches] [rowsPerBatch]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(5)
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
    import spark.implicits._

    val src = CdrTables.src(spark, sfDir)
    val lines = src.select(CsvCodec.encode(src).as("value")).as[String].collect()
    val rowsPerBatch = args.lift(2).map(_.toInt).getOrElse(lines.length)
    val out = Files.createTempDirectory("graft-sb-out").toString
    val ckpt = Files.createTempDirectory("graft-sb-ckpt").toString

    val mem = MemoryStream[String](spark)
    val imsiCache = new DimensionCache(() => CdrTables.imsiMsisdn(spark, sfDir), 60000L)
    val msIpCache = new DimensionCache(() => CdrTables.msIpExploded(spark, sfDir), 60000L)
    val q = CdrStreamJob.runForeachBatch(
      CsvCodec.decode(mem.toDF()), imsiCache, msIpCache, out, ckpt, triggerMs = 50L)

    // warm micro-batch (codegen + broadcast build), then timed batches
    mem.addData(lines.take(1000).toSeq: _*)
    q.processAllAvailable()
    val t0 = System.nanoTime()
    var fed = 0L
    (1 to nBatches).foreach { _ =>
      mem.addData(lines.take(rowsPerBatch).toSeq: _*)
      fed += rowsPerBatch
      q.processAllAvailable()
    }
    val dt = (System.nanoTime() - t0) / 1e9
    q.stop()
    val outRows = spark.read.parquet(out).count()
    println(f"""{"metric":"stream_rows_per_sec","value":${fed / dt}%.0f,"unit":"rows/s","in_rows":$fed,"out_rows":$outRows,"batches":$nBatches,"sec":$dt%.2f}""")
    spark.stop()
  }
}
