package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * The `events` table is written with parquet TIMESTAMP(NANOS) which Spark's
  * vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]); we read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (nanos surface as LongType) and
  * convert to TimestampType by integer-dividing to microseconds — exactly the
  * truncation DuckDB applies in `CAST(ts AS TIMESTAMP)`, so oracle SQL and
  * Spark results line up bit-for-bit.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session settings every entry point needs. Safe to call repeatedly. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Write µs (INT64) timestamps, not INT96 — what the DuckDB oracle produces.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` as a proper TimestampType (µs precision).
    * `ts div 1000` is integer division on the raw nanos — no double round-trip
    * (a Long→Double cast loses precision above 2^53 and ns epochs are ~1.7e18).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
