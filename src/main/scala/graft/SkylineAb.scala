package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B diagnostic for the skyline's two implementations — the custom
  * physical operator ([[graft.plans.SkylineExec]]) vs the typed-Dataset
  * mapPartitions twin — over an ×N synthetic point set. Substantiates the
  * De/SerializeObject-wall claim in SCALE.md with a measurement.
  * Usage: SkylineAb [rows] (default 10M).
  */
object SkylineAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic pseudo-random points, forced to disk-shape parallelism
    val pts = spark.range(n).select(col("id"),
        (col("id") * 48271 % 65521).as("x"),
        ((col("id") * 40503 % 65521) / 7.0).as("y"))
      .repartition(cpus.toInt * 2)
      .localCheckpoint(true)
    def timed(what: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[skyline-ab] $what%-12s $dt%7.2f s  rows=$r")
      dt
    }
    // warm both paths once (codegen/JIT), then measure twice each
    graft.operators.Skyline(pts, "x", "y").count()
    graft.operators.Skyline.viaDataset(pts, "x", "y").count()
    val tExec = (1 to 2).map(_ => timed("exec")(
      graft.operators.Skyline(pts, "x", "y").count())).min
    val tDs = (1 to 2).map(_ => timed("dataset")(
      graft.operators.Skyline.viaDataset(pts, "x", "y").count())).min
    println(s"""{"metric":"skyline_ab","rows":$n,"exec_sec":$tExec,"dataset_sec":$tDs}""")
    spark.stop()
  }
}
