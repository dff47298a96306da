package graft.cdr

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture adapter: derives the reference's three CDR tables (FIXTURES.md
  * §1–3, transcribed from /root/reference/src/main/java/org/example/
  * EnrichmentApp.java:160-269) deterministically from the driver-provided
  * parquet fixtures, so the DuckDB oracle can re-derive byte-identical inputs
  * from the same files.
  *
  *  - `src`            (streaming CDR fact)        ← events
  *  - `imsi_msisdn`    (subscriber dim, JDBC S2)   ← customer
  *  - `ms_ip_exploded` (IP-session dim, JDBC S4)   ← events sample
  *
  * Shapes mirror the reference generator's envelope (CsvData.java:104-152):
  * imsi present with p≈0.5 (`user_id % 2`), msisdn with p≈0.1
  * (`user_id % 10`), `ms_ip_address` is a ;-delimited list with leading and
  * trailing separators (→ empty tokens that T2 must filter), one third of
  * CDRs carry two IPs (explode fan-out), and `unique_cdr_id` collides across
  * adjacent events (`event_id - event_id % 2`) to feed the A1 argmax dedup.
  *
  * `CdrOracle.cte` is the DuckDB twin of this object — any change here must
  * be mirrored there.
  */
object CdrTables {

  /** Streaming CDR fact `src` (EnrichmentApp.java:160-181). */
  def src(spark: SparkSession, sfDir: String): DataFrame =
    srcFromEvents(Tables.events(spark, sfDir))

  /** Same derivation over any events-shaped DataFrame (scale-stress reuse). */
  def srcFromEvents(ev: DataFrame): DataFrame = {
    ev.select(
      col("ts").as("start_time"),
      concat(col("event_type"), lit("_probe")).as("measuring_probe_name"),
      when(col("user_id") % 2 === 0, col("user_id") + 100000L)
        .otherwise(lit(null).cast("long")).as("imsi"),
      when(col("user_id") % 10 === 0, col("user_id") + 79000000000L)
        .otherwise(lit(null).cast("long")).as("msisdn"),
      concat(
        lit(";10.0."), (col("user_id") % 50).cast("string"),
        lit("."), (col("event_id") % 4).cast("string"),
        when(col("event_id") % 3 === 0,
          concat(lit(";10.0."), ((col("user_id") + 1) % 50).cast("string"),
                 lit("."), ((col("event_id") + 1) % 4).cast("string")))
          .otherwise(lit("")),
        lit(";")).as("ms_ip_address"),
      (col("event_id") - (col("event_id") % 2)).as("unique_cdr_id"))
  }

  /** Subscriber dimension `imsi_msisdn` (EnrichmentApp.java:235-251).
    * `% 3 <> 0` carves out deliberate lookup misses (left-join keeps CDR). */
  def imsiMsisdn(spark: SparkSession, sfDir: String): DataFrame =
    Tables.table(spark, sfDir, "customer")
      .filter(col("c_custkey") % 3 =!= 0)
      .select(
        (col("c_custkey") + 100000L).as("imsi"),
        (col("c_custkey") + 88000000000L).as("msisdn"))

  /** Pre-exploded IP-session dimension `ms_ip_exploded`
    * (EnrichmentAppWithoutExplode.java:253-273). `date_trunc(hour)` gives
    * multiple session rows per (probe, ip) at distinct start_times — the
    * argmax-dedup fodder FIXTURES.md §3 requires. */
  def msIpExploded(spark: SparkSession, sfDir: String): DataFrame =
    msIpExplodedFromEvents(Tables.events(spark, sfDir))

  /** Same derivation over any events-shaped DataFrame (scale-stress reuse). */
  def msIpExplodedFromEvents(ev: DataFrame): DataFrame = {
    ev.filter(col("event_id") % 5 === 0)
      .select(
        date_trunc("hour", col("ts")).as("start_time"),
        (col("user_id") + 200000L).as("imsi"),
        (col("user_id") + 88800000000L).as("msisdn"),
        substring(col("event_type"), 1, 2).as("probe"),
        concat(lit("10.0."), (col("user_id") % 50).cast("string"),
               lit("."), (col("event_id") % 4).cast("string")).as("ip"))
      .distinct()
  }
}

/** DuckDB twin of [[CdrTables]] — prepended as a CTE to every CDR oracle. */
object CdrOracle {
  val cte: String =
    """WITH src AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS start_time,
      |    event_type || '_probe' AS measuring_probe_name,
      |    CASE WHEN user_id % 2 = 0 THEN user_id + 100000 END AS imsi,
      |    CASE WHEN user_id % 10 = 0 THEN user_id + 79000000000 END AS msisdn,
      |    ';10.0.' || CAST(user_id % 50 AS VARCHAR) || '.' || CAST(event_id % 4 AS VARCHAR)
      |      || CASE WHEN event_id % 3 = 0
      |              THEN ';10.0.' || CAST((user_id + 1) % 50 AS VARCHAR) || '.' || CAST((event_id + 1) % 4 AS VARCHAR)
      |              ELSE '' END
      |      || ';' AS ms_ip_address,
      |    event_id - (event_id % 2) AS unique_cdr_id
      |  FROM events
      |), imsi_msisdn AS (
      |  SELECT c_custkey + 100000 AS imsi, c_custkey + 88000000000 AS msisdn
      |  FROM customer WHERE c_custkey % 3 <> 0
      |), ms_ip_exploded AS (
      |  SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS start_time,
      |    user_id + 200000 AS imsi,
      |    user_id + 88800000000 AS msisdn,
      |    substr(event_type, 1, 2) AS probe,
      |    '10.0.' || CAST(user_id % 50 AS VARCHAR) || '.' || CAST(event_id % 4 AS VARCHAR) AS ip
      |  FROM events WHERE event_id % 5 = 0
      |), src_extended AS (
      |  SELECT *, strftime(start_time, '%Y-%m-%d') AS event_date,
      |    substr(measuring_probe_name, 1, 2) AS probe
      |  FROM src
      |), src_exploded AS (
      |  SELECT * FROM (
      |    SELECT s.*, trim(ip0) AS ip
      |    FROM src_extended s, LATERAL (SELECT unnest(string_split(trim(s.ms_ip_address), ';')) AS ip0) t
      |  ) WHERE ip <> ''
      |)
      |""".stripMargin
}
