package graft.llm

import graft.{Tables, Util}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Preference-data construction — the post-training half of a training-data
  * pipeline. Modern pipelines don't stop at pretraining curation: they
  * build PREFERENCE PAIRS (chosen/rejected, the DPO/RLHF reward signal)
  * and BEST-OF-N selections (rejection sampling) from scored candidate
  * pools, and they deduplicate instruction data by TEMPLATE (the same
  * prompt skeleton with different fillers teaches the model one thing N
  * times — template collapse is the instruction-tuning analogue of exact
  * dedup). The reference has none of this; it's beyond-reference surface
  * in the same oracle-gated style.
  *
  * Candidate pools here are the fixture's (source, lang) groups — the
  * stand-in for "N sampled responses to one prompt" — scored by the shared
  * integer-micro quality heuristic ([[TextAnalysis.qualityMicro]]), the
  * same score the quality-keeper dedup uses, so one pinned formula feeds
  * pretraining dedup AND preference construction.
  *
  * Scale shape: [[prefPairs]] is ONE map-side-combined aggregation (a
  * struct max and a struct min per group — no window, no per-group sort,
  * no shuffle beyond the group key); [[bestOfN]] is the k-row-per-group
  * window (rank ≤ k prunes before any downstream join); [[templateDedup]]
  * is a projection + groupBy, the exact-dedup plan over the normalized
  * template key. All three shuffle once on their group key and nothing
  * else — at 100 TB the group key (prompt id) is the natural partitioner.
  */
object PrefData {

  /** Pair-construction margin floor, micro quality units: a chosen/rejected
    * pair closer than this teaches nothing (label noise dominates) — the
    * standard DPO data-prep gate, pinned as an integer constant. */
  val MinMarginMicro = 10000L

  /** Docs + the shared integer quality score + the candidate-pool key —
    * keys carried through the score projection (no doc_id self-join; the
    * score is per-row, so the join would be a corpus shuffle for
    * nothing — measured: 24.6 s → 17.5 s at the ×100 stress; the
    * remainder is the per-row scoring itself). */
  private def scored(docs: DataFrame): DataFrame =
    TextAnalysis.qualityMicroKeyed(docs, Seq("source", "lang"))
      .select(col("source"), col("lang"), col("doc_id"), col("qm"))

  /** DPO-style pairs: per candidate pool, chosen = quality argmax,
    * rejected = quality argmin (doc_id breaks ties both ways, so the pair
    * is deterministic), kept only when the margin clears
    * [[MinMarginMicro]] and the two docs differ. Struct min/max keeps
    * this a single partial-aggregated pass — the 100 TB shape, where a
    * per-pool sort (window) would shuffle the full candidate set. */
  def prefPairs(docs: DataFrame): DataFrame =
    scored(docs)
      .groupBy(col("source"), col("lang"))
      .agg(max(struct(col("qm"), col("doc_id"))).as("c"),
        min(struct(col("qm"), col("doc_id"))).as("r"))
      .select(col("source"), col("lang"),
        col("c.doc_id").as("chosen_doc"), col("r.doc_id").as("rejected_doc"),
        col("c.qm").as("chosen_qm"), col("r.qm").as("rejected_qm"),
        (col("c.qm") - col("r.qm")).as("margin_micro"))
      .filter(col("chosen_doc") =!= col("rejected_doc") &&
        col("margin_micro") >= MinMarginMicro)

  /** DPO pairs pooled by PROMPT TEMPLATE — the real post-training shape:
    * "N sampled responses to one prompt" means the pool key is the prompt
    * skeleton, not the (source, lang) provenance stand-in. Composes the
    * [[templateDedup]] key (same [[templateCol]] normalization, so the
    * template-dedup report and the pair construction agree on what "one
    * prompt" is) with the [[prefPairs]] struct-min/max aggregation: still
    * ONE map-side-combined pass keyed on the template — at 100 TB the
    * prompt id is the natural partitioner and no per-pool sort exists.
    * Single-doc templates can't clear `chosen ≠ rejected` and drop out,
    * mirroring templateDedup's `n_docs > 1` gate. */
  def prefPairsByTemplate(docs: DataFrame, k: Int = 4): DataFrame =
    TextAnalysis.qualityMicroKeyed(
        docs.withColumn("template", templateCol(k)), Seq("template"))
      .groupBy(col("template"))
      .agg(max(struct(col("qm"), col("doc_id"))).as("c"),
        min(struct(col("qm"), col("doc_id"))).as("r"))
      .select(col("template"),
        col("c.doc_id").as("chosen_doc"), col("r.doc_id").as("rejected_doc"),
        col("c.qm").as("chosen_qm"), col("r.qm").as("rejected_qm"),
        (col("c.qm") - col("r.qm")).as("margin_micro"))
      .filter(col("chosen_doc") =!= col("rejected_doc") &&
        col("margin_micro") >= MinMarginMicro)

  /** Rejection sampling / best-of-n: the top `n` candidates per pool by
    * (quality, doc_id) with their rank — what a reward-model distillation
    * step consumes. The rank ≤ n filter prunes the pool before anything
    * downstream sees it. */
  def bestOfN(docs: DataFrame, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored(docs)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source"), col("lang"))
          .orderBy(col("qm").desc, col("doc_id").desc)))
      .filter(col("rank") <= n)
      .select(col("source"), col("lang"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("qm"))
  }

  /** Template key: the first `k` tokens, lowercased, digit runs collapsed
    * to '0' — the prompt skeleton with numeric fillers normalized away. */
  private def templateCol(k: Int) =
    lower(regexp_replace(
      concat_ws(" ", slice(split(col("text"), " "), 1, k)), "[0-9]+", "0"))

  /** Instruction-template dedup: group by the normalized template prefix,
    * report every template that covers more than one document — exemplar
    * (min doc_id), coverage, and how many sources it spans (a template
    * spanning many sources is boilerplate; one source is a local habit). */
  def templateDedup(docs: DataFrame, k: Int = 4): DataFrame =
    docs.select(col("doc_id"), col("source"), templateCol(k).as("template"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("exemplar"),
        countDistinct(col("source")).as("n_sources"))
      .filter(col("n_docs") > 1)

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pref_pairs" -> ((s, dir) => Util.orderAll(prefPairs(docs(s, dir)))),
    // k=2: the fixture's synthetic texts share 2-token openers far more
    // than 4-token ones (93 margin-clearing pairs vs 1 at k=4) — the
    // 1-row k=4 check would be near-vacuous
    "pref_pairs_template" -> ((s, dir) => Util.orderAll(prefPairsByTemplate(docs(s, dir), k = 2))),
    "pref_bestofn" -> ((s, dir) => Util.orderAll(bestOfN(docs(s, dir)))),
    "doc_template_dedup" -> ((s, dir) => Util.orderAll(templateDedup(docs(s, dir)))))

  /** Shared scored-pool CTE — the same [[TextAnalysis.qsMicroSql]] integer
    * formula the quality-keeper oracle uses. */
  private val scoredCte: String =
    s"""WITH q AS (
       |  SELECT source, lang, doc_id, ${TextAnalysis.qsMicroSql} AS qm
       |  FROM documents
       |)""".stripMargin

  def oracle: Map[String, String] = Map(
    "pref_pairs" -> (scoredCte + s""",
       |ranked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY source, lang ORDER BY qm DESC, doc_id DESC) AS rc,
       |    row_number() OVER (PARTITION BY source, lang ORDER BY qm ASC, doc_id ASC) AS rr
       |  FROM q
       |), c AS (SELECT source, lang, doc_id AS chosen_doc, qm AS chosen_qm FROM ranked WHERE rc = 1),
       |   r AS (SELECT source, lang, doc_id AS rejected_doc, qm AS rejected_qm FROM ranked WHERE rr = 1)
       |${Util.wrap(
          s"""SELECT source, lang, chosen_doc, rejected_doc, chosen_qm, rejected_qm,
             |  chosen_qm - rejected_qm AS margin_micro
             |FROM c JOIN r USING (source, lang)
             |WHERE chosen_doc <> rejected_doc AND chosen_qm - rejected_qm >= $MinMarginMicro""".stripMargin,
          Seq("source", "lang", "chosen_doc"))}""".stripMargin),

    // same min/max-rank construction as pref_pairs, pooled on the
    // doc_template_dedup key expression — one template normalization on
    // both engines (the SQL below is the templateDedup oracle's key verbatim)
    "pref_pairs_template" -> (s"""WITH q AS (
       |  SELECT lower(regexp_replace(array_to_string(string_split(text, ' ')[1:2], ' '),
       |      '[0-9]+', '0', 'g')) AS template,
       |    doc_id, ${TextAnalysis.qsMicroSql} AS qm
       |  FROM documents
       |), ranked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY template ORDER BY qm DESC, doc_id DESC) AS rc,
       |    row_number() OVER (PARTITION BY template ORDER BY qm ASC, doc_id ASC) AS rr
       |  FROM q
       |), c AS (SELECT template, doc_id AS chosen_doc, qm AS chosen_qm FROM ranked WHERE rc = 1),
       |   r AS (SELECT template, doc_id AS rejected_doc, qm AS rejected_qm FROM ranked WHERE rr = 1)
       |${Util.wrap(
          s"""SELECT template, chosen_doc, rejected_doc, chosen_qm, rejected_qm,
             |  chosen_qm - rejected_qm AS margin_micro
             |FROM c JOIN r USING (template)
             |WHERE chosen_doc <> rejected_doc AND chosen_qm - rejected_qm >= $MinMarginMicro""".stripMargin,
          Seq("template", "chosen_doc"))}""".stripMargin),

    "pref_bestofn" -> (scoredCte + s"""
       |${Util.wrap(
          """SELECT source, lang, CAST(rank AS BIGINT) AS rank, doc_id, qm FROM (
            |  SELECT *, row_number() OVER (PARTITION BY source, lang
            |    ORDER BY qm DESC, doc_id DESC) AS rank FROM q
            |) z WHERE rank <= 3""".stripMargin,
          Seq("source", "lang", "rank"))}""".stripMargin),

    "doc_template_dedup" -> Util.wrap(
      """SELECT template, count(*) AS n_docs, min(doc_id) AS exemplar,
        |  count(DISTINCT source) AS n_sources
        |FROM (
        |  SELECT doc_id, source,
        |    lower(regexp_replace(array_to_string(string_split(text, ' ')[1:4], ' '),
        |      '[0-9]+', '0', 'g')) AS template
        |  FROM documents
        |) t
        |GROUP BY template HAVING count(*) > 1""".stripMargin,
      Seq("template")))
}
