package graft.sources

import java.sql.DriverManager
import java.util.Properties

import graft.GraftConfig
import graft.streaming.{DimensionCache, PartialKeyCache}
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

  /** Per-key point-query fetcher — the lookup the reference's PARTIAL cache
    * fronts (`SELECT * FROM <table> WHERE <keyCol> = ?` per probed key,
    * the Flink JDBC connector's JdbcRowDataLookupFunction shape). Each call
    * opens/closes a connection; a deployment would pool, but the cache in
    * front means fetch volume is bounded by max-rows × TTL churn, not by
    * stream volume. Rows come back as lowercase-column-name → value maps. */
  def pointFetcher(url: String, table: String, keyCol: String,
                   user: String, password: String): Any => Seq[Map[String, Any]] = {
    key =>
      val props = new Properties()
      if (user.nonEmpty) props.setProperty("user", user)
      if (password.nonEmpty) props.setProperty("password", password)
      val conn = DriverManager.getConnection(url, props)
      try {
        val ps = conn.prepareStatement(s"SELECT * FROM $table WHERE $keyCol = ?")
        try {
          ps.setObject(1, key)
          val rs = ps.executeQuery()
          val meta = rs.getMetaData
          val cols = (1 to meta.getColumnCount).map(i => (i, meta.getColumnName(i).toLowerCase))
          val buf = Seq.newBuilder[Map[String, Any]]
          while (rs.next()) buf += cols.map { case (i, n) => n -> rs.getObject(i) }.toMap
          buf.result()
        } finally ps.close()
      } finally conn.close()
  }

  /** Per-key PARTIAL lookup cache for a dimension, wired from the same
    * flink.conf keys the reference uses (`lookup.partial-cache.max-rows`,
    * `lookup.partial-cache.expire-after-write` — flink.conf:37-48,
    * EnrichmentApp.java:246-248). This is the operational point-lookup path;
    * batch enrichment stays on the broadcast snapshot ([[imsiMsisdn]] etc.). */
  def partialCache(conf: GraftConfig, dim: String, keyCol: String,
                   clock: () => Long = () => System.currentTimeMillis())
      : PartialKeyCache[Any, Map[String, Any]] =
    new PartialKeyCache(
      pointFetcher(
        conf.get(s"$dim.url",
          conf.get("jdbc.url", "jdbc:postgresql://localhost:5432/postgres")),
        conf.get(s"$dim.dbtable", dim),
        keyCol,
        conf.get(s"$dim.user", conf.get("jdbc.username", "postgres")),
        conf.get(s"$dim.password", conf.get("jdbc.password", ""))),
      maxRows = conf.getInt(s"$dim.lookup.partial-cache.max-rows", 100),
      ttlMs = conf.getDurationMs(s"$dim.lookup.partial-cache.expire-after-write", 60000L),
      clock = clock)

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
