package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: SparkEntry.entry must return
  * rows > 0 on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // persist: count + show would otherwise each re-execute the full
    // two-branch enrichment plan
    val df = SparkEntry.entry(spark).persist()
    val n = df.count()
    df.show(5, truncate = false)
    df.unpersist()
    println(s"entry rows = $n (rows>0: ${n > 0})")
    spark.stop()
  }
}
