package graft

import graft.llm.{PrefData, TextAnalysis}
import org.apache.spark.sql.functions._

/** Preference-construction laws the DuckDB oracle can't isolate: argmax
  * dominance, margin arithmetic, rank contiguity, template-group
  * membership. */
class PrefDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.table(spark, sf, "documents")
  private lazy val qm = docs.join(TextAnalysis.qualityMicro(docs), "doc_id")
    .select(col("source"), col("lang"), col("doc_id"), col("qm")).cache()

  test("prefPairs: chosen dominates its whole pool, rejected is dominated, margin is the difference") {
    val pairs = PrefData.prefPairs(docs)
    val viol = pairs
      .join(qm.withColumnRenamed("doc_id", "other").withColumnRenamed("qm", "oqm"),
        Seq("source", "lang"))
      .filter(col("oqm") > col("chosen_qm") || col("oqm") < col("rejected_qm"))
    assert(viol.count() == 0L, "a pool member escapes the [rejected, chosen] quality envelope")
    assert(pairs.filter(col("margin_micro") =!=
      col("chosen_qm") - col("rejected_qm")).count() == 0L)
    assert(pairs.filter(col("margin_micro") < PrefData.MinMarginMicro).count() == 0L)
    assert(pairs.count() > 0L, "degenerate fixture: no pair clears the margin")
  }

  test("bestOfN: ranks are contiguous 1..min(n, pool) and follow (qm, doc_id) descending") {
    val top = PrefData.bestOfN(docs, 3)
    val perPool = top.groupBy("source", "lang")
      .agg(count(lit(1)).as("k"), max("rank").as("maxr"), min("rank").as("minr"))
    assert(perPool.filter(col("minr") =!= 1L || col("maxr") =!= col("k") ||
      col("k") > 3L).count() == 0L, "rank gaps or overflow")
    // rank 1 is the same doc prefPairs chooses (shared argmax definition)
    val r1 = top.filter(col("rank") === 1L)
      .select(col("source"), col("lang"), col("doc_id").as("top_doc"))
    val mismatch = PrefData.prefPairs(docs)
      .join(r1, Seq("source", "lang"))
      .filter(col("chosen_doc") =!= col("top_doc"))
    assert(mismatch.count() == 0L, "bestOfN rank 1 != prefPairs chosen")
  }

  test("templateDedup: every reported group's docs genuinely share the normalized prefix; exemplar is a member") {
    val groups = PrefData.templateDedup(docs, 4)
    val keyed = docs.select(col("doc_id"), lower(regexp_replace(
      concat_ws(" ", slice(split(col("text"), " "), 1, 4)), "[0-9]+", "0")).as("template"))
    val recount = keyed.groupBy("template").agg(
      count(lit(1)).as("n2"), min("doc_id").as("ex2"))
    val bad = groups.join(recount, "template")
      .filter(col("n_docs") =!= col("n2") || col("exemplar") =!= col("ex2"))
    assert(bad.count() == 0L)
    assert(groups.count() > 0L, "degenerate fixture: no template collapse to report")
  }

  test("stripAccents: NFD fold on precomposed/combining/supplementary input; ASCII fast path; NULL in NULL out") {
    import graft.functions.UnicodeFunctions.stripAccents
    val rows = Seq(
      ("caf\u00e9", "cafe"),                    // precomposed é
      ("cafe\u0301", "cafe"),                   // e + combining acute
      ("\u00f1 \u00f6 \u00e0", "n o a"),      // ñ ö à
      ("plain ascii", "plain ascii"),
      ("\ud83d\ude00 ok", "\ud83d\ude00 ok"))  // emoji untouched (not a mark)
      .toDF("s", "want")
      .withColumn("got", stripAccents(col("s")))
    assert(rows.filter(col("got") =!= col("want")).count() == 0L)
    val nulls = Seq(Tuple1(null: String)).toDF("s")
      .withColumn("got", stripAccents(col("s")))
    assert(nulls.filter(col("got").isNotNull).count() == 0L)
  }

  test("normalizeUnicode: roundtrip — strip after inject reproduces the original text, counts match the injected vowels") {
    import graft.llm.TextAnalysis
    val docs = Tables.table(spark, sf, "documents")
    val out = TextAnalysis.normalizeUnicode(docs)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
    assert(out.filter(col("normalized") =!= col("text")).count() == 0L,
      "strip(inject(text)) must equal text")
    val bad = out
      .withColumn("vowels", (length(col("text")) -
        length(translate(col("text"), "aeiou", ""))).cast("long"))
      .filter((col("doc_id") % 3 === 1 && col("n_accented") =!= col("vowels")) ||
        (col("doc_id") % 3 =!= 1 && col("n_accented") =!= 0L))
    assert(bad.count() == 0L, "accent count must equal injected vowel count")
  }
}
