package graft.sources

import java.util.Properties

import graft.GraftConfig
import graft.streaming.DimensionCache
import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC dimension-table sources (SURVEY §2 S2–S4).
  *
  * The reference declares three Postgres-backed dimension tables —
  * `imsi_msisdn` (lookup, partial cache 100 rows / 60 s TTL), `ms_ip`
  * (scan), `ms_ip_exploded` (lookup, 1000 rows / 60 s TTL) — at
  * EnrichmentApp.java:235-269 and EnrichmentAppWithoutExplode.java:233-273,
  * endpoints in flink.conf:23-49.
  *
  * Spark mapping: `spark.read.jdbc` produces the bounded snapshot; wrapping
  * the loader in a [[DimensionCache]] with the configured TTL reproduces the
  * lookup-cache freshness contract, and the stream-static join (CdrPipeline)
  * supplies FOR SYSTEM_TIME AS OF semantics per micro-batch.
  *
  * Scale notes: dims here are lookup-sized (≤ thousands of rows) so a single
  * un-partitioned JDBC read + broadcast is right. For a dimension that
  * outgrows one task, pass `partitionColumn`/bounds through `extra` —
  * `spark.read.jdbc` then issues parallel range-partitioned queries — and
  * drop the broadcast hint so the join shuffles instead.
  *
  * Exercised end-to-end against a live embedded Derby database
  * (JdbcDimSpec): real DriverManager handshake, dialect type mapping and
  * table scan, with the parquet-derived fixture dims (CdrTables) as the
  * oracle. No Postgres ships in this container; the URL is the only
  * difference between the tested path and the reference deployment.
  */
object JdbcDim {

  def read(spark: SparkSession, url: String, table: String,
           user: String, password: String,
           extra: Map[String, String] = Map.empty): DataFrame = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    extra.foreach { case (k, v) => props.setProperty(k, v) }
    spark.read.jdbc(url, table, props)
  }

  /** S2: subscriber dim keyed by imsi (EnrichmentApp.java:235-251). */
  def imsiMsisdn(spark: SparkSession, conf: GraftConfig): DimensionCache =
    cached(spark, conf, "imsi_msisdn")

  /** S3: raw IP-session dim, ;-delimited ip list (EnrichmentApp.java:253-269). */
  def msIp(spark: SparkSession, conf: GraftConfig): DimensionCache =
    cached(spark, conf, "ms_ip")

  /** S4: pre-exploded IP-session dim (EnrichmentAppWithoutExplode.java:253-273). */
  def msIpExploded(spark: SparkSession, conf: GraftConfig): DimensionCache =
    cached(spark, conf, "ms_ip_exploded")

  /** Keys mirror the reference flink.conf block per dimension —
    * `<dim>.url/.dbtable/.user/.password` and the HOCON duration
    * `<dim>.lookup.partial-cache.expire-after-write` ("60s") — with
    * engine-global `jdbc.*` fallbacks for fresh deployments. */
  private def cached(spark: SparkSession, conf: GraftConfig,
                     dim: String): DimensionCache =
    new DimensionCache(
      () => read(spark,
        conf.get(s"$dim.url",
          conf.get("jdbc.url", "jdbc:postgresql://localhost:5432/postgres")),
        conf.get(s"$dim.dbtable", dim),
        conf.get(s"$dim.user", conf.get("jdbc.username", "postgres")),
        conf.get(s"$dim.password", conf.get("jdbc.password", ""))),
      conf.getDurationMs(s"$dim.lookup.partial-cache.expire-after-write", 60000L))
}
