package graft

import org.apache.spark.sql.types._

/** The canary for driver-side fixture regeneration: asserts the exact
  * POST-ADAPTER schema of all 10 driver tables at sf0.001, so a parquet
  * encoding change (like r6's TIMESTAMP(NANOS) → timestamp[us] flip on
  * `events.ts`) fails here in seconds with one readable diff instead of as
  * 21 downstream analysis errors.
  *
  * Timestamp columns are written by the driver without a zone annotation, so
  * the raw reader surfaces TimestampNTZType; the session zone is pinned UTC
  * everywhere (Tables.configure), making NTZ↔TZ the identity on epoch values
  * and keeping DuckDB's `CAST(ts AS TIMESTAMP)` bit-identical.
  */
class FixtureSpec extends SparkSpec {

  private def schemaOf(name: String): Seq[(String, DataType)] =
    Tables.table(spark, sf, name).schema.fields.toSeq.map(f => f.name -> f.dataType)

  test("raw fixture schemas match the documented contract (all 10 tables)") {
    val expected: Map[String, Seq[(String, DataType)]] = Map(
      "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
      "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
        "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
        "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType,
        "l_returnflag" -> StringType, "l_linestatus" -> StringType,
        "l_shipdate" -> TimestampNTZType),
      "events" -> Seq("event_id" -> LongType, "ts" -> TimestampNTZType,
        "user_id" -> LongType, "event_type" -> StringType,
        "value" -> DoubleType, "props" -> StringType),
      "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Seq("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true),
        "label" -> IntegerType))

    val drift = Tables.names.flatMap { t =>
      val actual = schemaOf(t)
      if (actual == expected(t)) Nil
      else Seq(s"$t:\n  expected ${expected(t).map { case (n, d) => s"$n:${d.simpleString}" }.mkString(", ")}" +
        s"\n  actual   ${actual.map { case (n, d) => s"$n:${d.simpleString}" }.mkString(", ")}")
    }
    assert(drift.isEmpty,
      s"\nFIXTURE SCHEMA DRIFT — the driver regenerated /root/testdata with a " +
        s"different parquet encoding; adapt graft.Tables:\n${drift.mkString("\n")}")
  }

  test("Tables.events adapter yields µs TimestampType regardless of on-disk encoding") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)
  }

  test("Tables.events adapter handles legacy nanos-as-Long encoding") {
    import spark.implicits._
    // simulate the pre-r6 fixture: raw Long nanos column named ts
    val dir = java.nio.file.Files.createTempDirectory("fixture-nanos").toString
    val nanos = 1653475440123456789L // ...789 ns must truncate away, not round
    Seq((1L, nanos)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    val micros = ev.select(org.apache.spark.sql.functions.unix_micros(
      org.apache.spark.sql.functions.col("ts"))).as[Long].head()
    assert(micros === nanos / 1000L) // integer truncation, identical to DuckDB CAST
  }

  test("Tables.events raises one typed FixtureSchemaDrift on an unknown ts encoding") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fixture-drift").toString
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[FixtureSchemaDrift] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("events.parquet"))
    assert(e.getMessage.contains("`ts`"))
    assert(e.getMessage.contains("string"))
  }

  test("Tables.events raises FixtureSchemaDrift when ts is missing entirely") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fixture-nots").toString
    Seq((1L, 2.0)).toDF("event_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[FixtureSchemaDrift] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("<column missing>"))
  }
}
