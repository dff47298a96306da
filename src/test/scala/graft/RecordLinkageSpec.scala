package graft

import graft.llm.RecordLinkage
import org.apache.spark.sql.functions._

/** Laws of the Fellegi–Sunter linkage operator that the DuckDB oracle
  * can't see: perfect recall of true twins, score decomposition, class
  * boundaries, and blocking containment. */
class RecordLinkageSpec extends SparkSpec {

  private lazy val customers = Tables.table(spark, sf, "customer")
  private lazy val pairs = RecordLinkage.linkPairs(customers).cache()

  test("every record's true twin survives at >= possible (recall = 1)") {
    // worst true pair: name one-edit (+12000), segment wiped (-1200),
    // balance off by 75 cents (-1000) = 9800, still above the band floor
    val truePairs = pairs.filter(col("cust_a") === col("cust_b")).count()
    assert(truePairs == customers.count(),
      s"lost true twins: $truePairs of ${customers.count()}")
  }

  test("score decomposes as the pinned weight sum; classes honor thresholds") {
    import RecordLinkage._
    val recomputed =
      when(col("agree_name") === 1, WNameAgree).otherwise(WNameDis) +
        when(col("agree_mkt") === 1, WMktAgree).otherwise(WMktDis) +
        when(col("agree_bal") === 1, WBalAgree).otherwise(WBalDis)
    assert(pairs.filter(col("score") =!= recomputed).count() == 0L)
    assert(pairs.filter(col("score") < PossibleMin).count() == 0L,
      "nonmatch band must be dropped")
    assert(pairs.filter(col("cls") === "match" && col("score") < MatchMin).count() == 0L)
    assert(pairs.filter(col("cls") === "possible" && col("score") >= MatchMin).count() == 0L)
  }

  test("candidates come only from the blocking key (no cross-block pairs)") {
    val nk = customers.select(col("c_custkey").as("k"), col("c_nationkey").as("n"))
    val cross = pairs
      .join(nk.withColumnRenamed("k", "cust_a").withColumnRenamed("n", "na"), "cust_a")
      .join(nk.withColumnRenamed("k", "cust_b").withColumnRenamed("n", "nb"), "cust_b")
      .filter(col("na") =!= col("nb"))
    assert(cross.count() == 0L, "a pair escaped its block")
  }

  test("a match needs the name signal: no match without agree_name") {
    // max score with name disagreement: -4000 + 1800 + 1500 < MatchMin
    assert(pairs.filter(col("cls") === "match" && col("agree_name") === 0)
      .count() == 0L)
  }

  test("multi-pass blocking recovers every blocking-corrupted twin") {
    val recall = RecordLinkage.linkRecall(customers)
      .collect().map(r => r.getAs[String]("mode") -> r.getAs[Long]("n_true_found")).toMap
    val total = customers.count()
    val corrupted = customers.filter(col("c_custkey") % 11 === 0).count()
    assert(recall("multi_pass") == total,
      s"multi-pass must find every twin: ${recall("multi_pass")} of $total")
    assert(recall("single_pass") == total - corrupted,
      s"single-pass must miss exactly the $corrupted nation-corrupted twins, " +
        s"found ${recall("single_pass")}")
  }

  test("multi-pass emits no duplicate pairs and scores like the single stage") {
    val mp = RecordLinkage.linkPairsMultiPass(customers)
    assert(mp.groupBy("cust_a", "cust_b").count().filter(col("count") > 1).count() == 0L,
      "a pair found by both passes must be emitted once")
    // pairs whose block survived corruption score identically in both ops
    val uncorrupted = pairs.filter(col("cust_b") % 11 =!= 0)
    val joint = uncorrupted.alias("s").join(mp.alias("m"), Seq("cust_a", "cust_b"))
      .filter(col("s.score") =!= col("m.score"))
    assert(joint.count() == 0L, "shared pairs must score identically")
  }

  test("eval cells partition the pair set and preserve score ranges") {
    val ev = RecordLinkage.linkEval(customers)
    assert(ev.agg(sum("n")).head().getLong(0) == pairs.count())
    val bad = ev.filter(col("min_score") > col("max_score") ||
      (col("cls") === "match" && col("min_score") < RecordLinkage.MatchMin))
    assert(bad.count() == 0L)
  }

  test("sampled eval arm: cells equal the full eval restricted to the sampled clean keys") {
    val mod = 4L
    val sampled = RecordLinkage.linkEval(customers, sampleMod = mod)
    // independent recount: restrict the FULL pair table to the same
    // deterministic clean-side slice and re-aggregate — cells must agree
    // exactly (the sample is taken before blocking, so restriction after
    // the fact sees the identical pair set)
    val expected = pairs
      .filter(pmod(xxhash64(col("cust_a")), lit(mod)) === 0)
      .withColumn("is_true", (col("cust_a") === col("cust_b")).cast("long"))
      .groupBy(col("cls"), col("is_true"))
      .agg(count(lit(1)).as("n"), min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
    assert(sampled.exceptAll(expected).count() == 0L &&
      expected.exceptAll(sampled).count() == 0L,
      "sampled-arm cells diverge from the restricted full eval")
    // and the sample must actually bite: strictly fewer pairs than full
    val nS = sampled.agg(sum("n")).head().getLong(0)
    assert(nS > 0L && nS < pairs.count(), s"degenerate sample: $nS")
  }
}
