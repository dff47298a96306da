package graft

import java.sql.DriverManager

import graft.cdr.{CdrPipeline, CdrTables}
import graft.sources.JdbcDim
import org.apache.spark.sql.DataFrame

/** S2/S3/S4 end-to-end over a LIVE JDBC database.
  *
  * The reference's dims are Postgres tables (flink.conf:23-49); no Postgres
  * ships in this sandbox, but Derby's embedded engine is already on the
  * Spark classpath (/opt/spark/jars/derby-10.16.1.1.jar), so
  * `spark.read.jdbc` can be driven against a real in-process database —
  * DriverManager handshake, dialect type mapping, pushed table scan — not
  * just the parquet fixture twins. The fixtures stay the oracle: each test
  * loads the fixture rows INTO Derby, reads them back through
  * [[JdbcDim.read]], and asserts the JDBC-sourced pipeline output is
  * identical to the fixture-sourced one.
  */
class JdbcDimSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdims;create=true"

  /** Create-or-replace a Derby table and load a two-long-column dim into it. */
  private def loadLongPair(table: String, cols: (String, String),
                           rows: Seq[(Option[Long], Option[Long])]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(s"DROP TABLE $table") catch { case _: java.sql.SQLException => }
      st.execute(s"CREATE TABLE $table (${cols._1} BIGINT, ${cols._2} BIGINT)")
      st.close()
      val ps = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?)")
      rows.foreach { case (a, b) =>
        a.fold(ps.setNull(1, java.sql.Types.BIGINT))(ps.setLong(1, _))
        b.fold(ps.setNull(2, java.sql.Types.BIGINT))(ps.setLong(2, _))
        ps.addBatch()
      }
      ps.executeBatch()
      ps.close()
    } finally conn.close()
  }

  /** Load the 5-column ms_ip_exploded dim (timestamp + 2 longs + 2 strings). */
  private def loadMsIpExploded(table: String, dim: DataFrame): Unit = {
    val rows = dim.select("start_time", "imsi", "msisdn", "probe", "ip")
      .as[(java.sql.Timestamp, Long, Long, String, String)].collect()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(s"DROP TABLE $table") catch { case _: java.sql.SQLException => }
      st.execute(s"CREATE TABLE $table (start_time TIMESTAMP, imsi BIGINT, " +
        "msisdn BIGINT, probe VARCHAR(8), ip VARCHAR(64))")
      st.close()
      val ps = conn.prepareStatement(s"INSERT INTO $table VALUES (?, ?, ?, ?, ?)")
      rows.foreach { case (t, i, m, p, ip) =>
        ps.setTimestamp(1, t); ps.setLong(2, i); ps.setLong(3, m)
        ps.setString(4, p); ps.setString(5, ip)
        ps.addBatch()
      }
      ps.executeBatch()
      ps.close()
    } finally conn.close()
  }

  test("S2 live: JDBC-read imsi_msisdn drives cdr_lookup_left identically to the fixture") {
    val fixture = CdrTables.imsiMsisdn(spark, sf)
    loadLongPair("imsi_msisdn", ("imsi", "msisdn"),
      fixture.as[(Long, Long)].collect().toSeq.map { case (a, b) => (Some(a), Some(b)) })

    val jdbcDim = JdbcDim.read(spark, url, "imsi_msisdn", "", "")
    assert(jdbcDim.schema.map(f => (f.name.toLowerCase, f.dataType)) ==
      fixture.schema.map(f => (f.name.toLowerCase, f.dataType)))
    // column names come back per the database's case rules — normalize
    val dim = jdbcDim.toDF(jdbcDim.columns.map(_.toLowerCase): _*)

    val src = CdrPipeline.extendWithPartitionCols(CdrTables.src(spark, sf))
    val viaJdbc = CdrPipeline.projectToSink(
      CdrPipeline.lookupEnrich(src, dim, "left_outer")).collect().toSet
    val viaFixture = CdrPipeline.projectToSink(
      CdrPipeline.lookupEnrich(src, fixture, "left_outer")).collect().toSet
    assert(viaJdbc == viaFixture)
    assert(viaJdbc.nonEmpty)
  }

  test("S4 live: JDBC-read ms_ip_exploded drives the range enrichment identically") {
    val fixture = CdrTables.msIpExploded(spark, sf)
    loadMsIpExploded("ms_ip_exploded", fixture)

    val raw = JdbcDim.read(spark, url, "ms_ip_exploded", "", "")
    val dim = raw.toDF(raw.columns.map(_.toLowerCase): _*)

    val src = CdrPipeline.explodeIps(
      CdrPipeline.extendWithPartitionCols(CdrTables.src(spark, sf)))
    val viaJdbc = CdrPipeline.projectToSink(CdrPipeline.dedupLatestAgg(
      CdrPipeline.rangeEnrich(src, dim, "left_outer"))).collect().toSet
    val viaFixture = CdrPipeline.projectToSink(CdrPipeline.dedupLatestAgg(
      CdrPipeline.rangeEnrich(src, fixture, "left_outer"))).collect().toSet
    assert(viaJdbc == viaFixture)
    assert(viaJdbc.nonEmpty)
  }

  test("S2 config path: JdbcDim.imsiMsisdn resolves url/table from GraftConfig and caches") {
    val fixture = CdrTables.imsiMsisdn(spark, sf)
    loadLongPair("imsi_cfg", ("imsi", "msisdn"),
      fixture.as[(Long, Long)].collect().toSeq.map { case (a, b) => (Some(a), Some(b)) })

    val conf = GraftConfig.fromMap(Map(
      "imsi_msisdn.url" -> url,
      "imsi_msisdn.dbtable" -> "imsi_cfg",
      "imsi_msisdn.user" -> "",
      "imsi_msisdn.password" -> "",
      "imsi_msisdn.lookup.partial-cache.expire-after-write" -> "\"60s\""))
    val cache = JdbcDim.imsiMsisdn(spark, conf)
    try {
      val got = cache.get()
      assert(got.count() == fixture.count())
      // within the TTL the same snapshot (and its cached plan) is reused
      assert(cache.get() eq got)
    } finally cache.invalidate()
  }
}
