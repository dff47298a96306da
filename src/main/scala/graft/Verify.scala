package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names — iterate on one query
    // without paying the full 100+-query dump (driver always omits it)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.configure(spark) // nanos-as-long, UTC, µs parquet timestamps
    new java.io.File(outDir).mkdirs()
    val attempted = Seq.newBuilder[String]
    val failed = Seq.newBuilder[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      attempted += name
      try {
        val df = fn(spark, sfDir)
        // Dump TIMESTAMP as NTZ: session tz is UTC so the wall-clock value is
        // unchanged, but the parquet file loses isAdjustedToUTC — matching the
        // naive timestamps the DuckDB oracle computes (otherwise every
        // timestamp column hash-mismatches on tz-awareness alone).
        val ntz = df.schema.fields.foldLeft(df) { (d, f) =>
          f.dataType match {
            case org.apache.spark.sql.types.TimestampType =>
              d.withColumn(f.name, org.apache.spark.sql.functions.col(f.name)
                .cast(org.apache.spark.sql.types.TimestampNTZType))
            case _ => d
          }
        }
        ntz.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Run manifest: which queries this dump attempted and which crashed —
    // lets the checker fail on a query that died before writing parquet
    // instead of mistaking its absence for "not in this subset run".
    def arr(xs: Seq[String]): String = xs.map(q).mkString("[", ",", "]")
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      s"""{"attempted": ${arr(attempted.result())}, "failed": ${arr(failed.result())}}""")
    spark.stop()
  }
}
