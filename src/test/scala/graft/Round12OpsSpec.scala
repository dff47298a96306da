package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Specs for the round-12 work: the two-phase distributed prefix sum that
  * replaced the per-source running-sum window (the r11 verdict's last
  * scale-killer shape), the stored-artifact curation twins, and the packed
  * token-shard append path. Fixture oracle parity stays the driver's
  * DuckDB gate; these pin the laws the oracle can't isolate. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  test("PrefixSum.cumStart == the naive per-source running-sum window, skewed sources + sparse ids") {
    // one source carries 90% of rows (the CommonCrawl-shaped mix the
    // operator exists for); ids are sparse hashes, not dense — the
    // quantile bucketing must not assume density
    val rows = (0 until 2000).map { i =>
      val src = if (i % 10 == 0) s"small${i % 3}" else "bulk"
      // deterministic sparse id, unique: spread plus index to avoid clashes
      val id = (i.toLong * 2654435761L) % 1000000007L * 64 + i
      (id, src, (i % 17) + 1L)
    }
    val df = rows.toDF("doc_id", "source", "n")
    val naive = df.withColumn("cum_start",
      (sum($"n").over(Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - $"n")
        .cast("long"))
    for (nBuckets <- Seq(1, 7, 32)) {
      val two = graft.operators.PrefixSum.cumStart(
        df, "n", df.select($"doc_id"), nBuckets)
      val exp = naive.collect().map(_.toString).sorted.toSeq
      val got = two.collect().map(_.toString).sorted.toSeq
      assert(got == exp, s"prefix sum diverged at nBuckets=$nBuckets")
    }
  }

  test("PrefixSum one-source law: cum_start replays the exact running sum in doc_id order") {
    // the degenerate everything-in-one-source corpus is precisely the case
    // the operator exists for — the law is checked value-by-value against
    // a driver-side replay, independent of any Spark window
    val df = spark.range(5000).select($"id".as("doc_id"),
      lit("bulk").as("source"), ($"id" % 9 + 1).as("n"))
    val two = graft.operators.PrefixSum.cumStart(
      df, "n", df.select($"doc_id"), 16)
    val got = two.orderBy($"doc_id").select($"cum_start").as[Long].collect()
    val ns = df.orderBy($"doc_id").select($"n").as[Long].collect()
    var run = 0L
    got.zip(ns).foreach { case (c, n) => assert(c == run, s"at run=$run"); run += n }
  }
}
