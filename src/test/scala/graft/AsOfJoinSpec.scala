package graft

import java.sql.Timestamp

import graft.cdr.{CdrPipeline, CdrTables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** The as-of join must agree with the naive range-join + per-group argmax
  * on the matched timestamp, and honor SQL NULL/tie semantics. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of: picks the latest right row at-or-before the left timestamp (inclusive)") {
    val left = Seq(
      ("k1", ts("2024-01-01 10:00:00"), 1L),
      ("k1", ts("2024-01-01 12:00:00"), 2L),
      ("k1", ts("2024-01-01 09:00:00"), 3L), // before every right row
      ("k2", ts("2024-01-01 10:00:00"), 4L)  // key with no right rows
    ).toDF("k", "t", "id")
    val right = Seq(
      ("k1", ts("2024-01-01 10:00:00"), 100L), // == left ts ⇒ inclusive match
      ("k1", ts("2024-01-01 11:30:00"), 200L)
    ).toDF("k", "t", "v")

    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "t",
      Seq("v" -> "_v", "t" -> "_t"))
    assert(out.count() == 4)
    val byId = out.select("id", "_v").as[(Long, Option[Long])].collect().toMap
    assert(byId(1L).contains(100L)) // inclusive >=
    assert(byId(2L).contains(200L))
    assert(byId(3L).isEmpty)        // nothing at-or-before
    assert(byId(4L).isEmpty)        // no right rows for key
  }

  test("as-of: NULL left key or timestamp matches nothing; right ties are deterministic") {
    val left = Seq(
      (Option("k1"), Option(ts("2024-01-01 12:00:00")), 1L),
      (Option.empty[String], Option(ts("2024-01-01 12:00:00")), 2L),
      (Option("k1"), Option.empty[Timestamp], 3L)
    ).toDF("k", "t", "id")
    val right = Seq(
      // duplicate (key, time): pre-reduction keeps max(struct(v)) = 300
      ("k1", ts("2024-01-01 10:00:00"), 300L),
      ("k1", ts("2024-01-01 10:00:00"), 250L)
    ).toDF("k", "t", "v")
    val byId = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "t",
      Seq("v" -> "_v")).select("id", "_v").as[(Long, Option[Long])].collect().toMap
    assert(byId(1L).contains(300L)) // deterministic tie winner
    assert(byId(2L).isEmpty)        // NULL key
    assert(byId(3L).isEmpty)        // NULL timestamp
  }

  test("as-of: payload may name an equi-key column ('which key matched')") {
    val left = Seq(("k1", ts("2024-01-01 12:00:00"), 1L)).toDF("k", "t", "id")
    val right = Seq(("k1", ts("2024-01-01 10:00:00"), 7L)).toDF("k", "t", "v")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "t",
      Seq("k" -> "matched_k", "t" -> "matched_t", "v" -> "_v"))
      .select("id", "matched_k", "_v").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "k1", 7L)))
  }

  test("as-of skew mode: time-bucketed plan is bit-identical to the plain plan") {
    // one pathologically hot key: 500 left rows + 40 right sessions on a
    // single (k) over 10 hours, plus a cold key and the NULL/tie edge cases
    val base = ts("2024-01-01 00:00:00").getTime
    val left = ((0 until 500).map(i =>
      (Option("hot"), Option(new Timestamp(base + i * 71000L)), i.toLong)) ++
      Seq((Option("cold"), Option(new Timestamp(base + 3600000L)), 9001L),
        (Option.empty[String], Option(new Timestamp(base)), 9002L),
        (Option("hot"), Option.empty[Timestamp], 9003L)))
      .toDF("k", "t", "id")
    val right = ((0 until 40).map(i =>
      ("hot", new Timestamp(base + i * 900000L), i * 10L)) ++
      Seq(("cold", new Timestamp(base), 7777L)))
      .toDF("k", "t", "v")

    val plain = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "t",
      Seq("v" -> "_v", "t" -> "_t"))
    // 600 s buckets ≪ the 900 s right-session spacing: most left buckets
    // have NO in-bucket right row and depend entirely on the carry-in seeds
    val bucketed = AsOfJoin.leftAsOf(left, right, Seq("k"), "t", "t",
      Seq("v" -> "_v", "t" -> "_t"), bucketSeconds = 600L)
    assert(bucketed.count() == left.count())
    assert(plain.exceptAll(bucketed).isEmpty && bucketed.exceptAll(plain).isEmpty)
    // the skew objective: the big window must partition by (key, bucket),
    // not by the key alone — i.e. the hot key's sort is split
    val winSpecs = bucketed.queryExecution.optimizedPlan.toString
    assert(winSpecs.contains("windowspecdefinition(k#") || winSpecs.contains("__b"),
      s"bucketed window spec missing:\n$winSpecs")
    assert(winSpecs.contains("__b"), s"no bucket column in the plan:\n$winSpecs")
  }

  test("as-of skew mode: cdr_asof_enrich result is unchanged under bucketing") {
    val ext = CdrPipeline.extendWithPartitionCols(CdrTables.src(spark, sf))
    val left = CdrPipeline.explodeIps(ext.filter(col("imsi").isNull))
    val dim = CdrTables.msIpExploded(spark, sf)
    val payload = Seq("imsi" -> "_imsi", "msisdn" -> "_msisdn", "start_time" -> "_start_time")
    val plain = AsOfJoin.leftAsOf(left, dim, Seq("probe", "ip"),
      "start_time", "start_time", payload)
    val bucketed = AsOfJoin.leftAsOf(left, dim, Seq("probe", "ip"),
      "start_time", "start_time", payload, bucketSeconds = 3600L)
    assert(plain.exceptAll(bucketed).isEmpty && bucketed.exceptAll(plain).isEmpty)
  }

  test("as-of == range-join + argmax on the matched timestamp (CDR fixtures)") {
    val ext = CdrPipeline.extendWithPartitionCols(CdrTables.src(spark, sf))
    val left = CdrPipeline.explodeIps(ext.filter(col("imsi").isNull))
    val dim = CdrTables.msIpExploded(spark, sf)

    val asof = AsOfJoin.leftAsOf(left, dim,
      Seq("probe", "ip"), "start_time", "start_time",
      Seq("start_time" -> "_start_time"))
      .select(col("unique_cdr_id"), col("ip"), col("start_time"), col("_start_time"))

    val naive = CdrPipeline.rangeEnrich(left, dim, "left_outer")
      .groupBy(col("unique_cdr_id"), col("ip"), col("start_time"))
      .agg(max(col("_start_time")).as("_start_time"))

    assert(asof.count() == left.count(), "exactly one output row per left row")
    assert(asof.exceptAll(naive).isEmpty && naive.exceptAll(asof).isEmpty,
      "as-of must agree with range-join + argmax")
  }
}
