package graft.llm

import graft.{Tables, Util}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword segmentation (the SentencePiece decode side): given a
  * pinned piece vocabulary with per-piece costs (≈ −log p in integer micros),
  * segment every word into the min-cost piece sequence by Viterbi DP. This is
  * the APPLY half of a unigram tokenizer — the counterpart to
  * [[BpeTrainer]]'s merge-table apply, covering the other of the two subword
  * families real pipelines tokenize with (BPE = bottom-up greedy merges;
  * unigram = top-down global-optimum segmentation, which is why the two can
  * disagree on the same word). Vocabulary costs are pinned constants
  * ([[pieceTable]], the `RetrievalWeights` single-source pattern): EM
  * re-estimation is driver-side training out of scope here, exactly like
  * BPE's merge learning is separated from its apply.
  *
  * Determinism contract: ties in total cost are broken by the
  * lexicographically smallest space-joined piece string. The DP carries
  * (cost, path) pairs — sound because both composition operations are
  * monotone (cost is additive; for a fixed prefix, string concatenation
  * preserves the order of suffixes), so the per-state minimum over pairs is
  * the global minimum. The oracle does not trust the DP: it enumerates EVERY
  * segmentation by recursive CTE (words ≤ 8 chars → ≤ a few hundred paths)
  * and takes the same (cost, path) minimum by window rank, so a DP bug
  * cannot hide behind a matching DP in the oracle.
  *
  * Scale notes (100 TB): the DP runs over DISTINCT words, never the corpus —
  * the same Zipf collapse [[BpeTrainer]] exploits (a trillion tokens is tens
  * of millions of distinct words; the segmentation table is megabytes). The
  * corpus-sized pass is a broadcast join of that table back onto exploded
  * tokens followed by a partial-aggregated per-doc count; above broadcast
  * range the join degrades to a shuffle join on `word` — Catalyst's call
  * once the hint is size-gated. Per-word work is O(len · maxPieceLen) with
  * zero allocation beyond the path strings.
  */
object UnigramLm {

  /** Multi-char pieces, rank-ordered (index feeds the cost formula so every
    * piece cost is distinct). Singles for all 26 letters are added by
    * [[pieceTable]], so segmentation is total over lowercase words. */
  private val multiPieces: Seq[String] = Seq(
    "cust", "omer", "wind", "quer", "eam", "str", "tab", "col", "umn",
    "mer", "ord", "sor", "sca", "lin", "sma", "slo", "bat", "val", "vec",
    "tor", "has", "spa", "oup", "agg", "ry", "ge", "ue", "er", "rk", "jo",
    "in", "da", "ta", "gr", "ch", "sh", "ow", "up", "le", "ll", "an", "st",
    "th", "ey", "bi", "du", "fa", "ke", "pa", "rt", "ro", "he", "al", "ne")

  /** (piece, cost_micro) — the ONE table both engines read. Longer pieces
    * are cheaper per the usual unigram-LM shape (a long piece existing at
    * all means it was frequent); single chars are the expensive fallback. */
  val pieceTable: Seq[(String, Long)] = {
    require(multiPieces.distinct.size == multiPieces.size, "duplicate piece")
    val singles = ('a' to 'z').map(c => (c.toString, 40000L + 101L * (c - 'a')))
    val multis = multiPieces.zipWithIndex.map { case (p, i) =>
      (p, (39000L - 9000L * p.length) + 37L * i)
    }
    singles ++ multis
  }

  private val pieceMap: Map[String, Long] = pieceTable.toMap
  private val maxPieceLen: Int = pieceTable.map(_._1.length).max

  /** Viterbi over one word: min (cost, path) segmentation, path space-joined.
    * Backward DP so path construction is a prepend of the candidate piece. */
  private[graft] def segmentWord(word: String): (String, Long) = {
    val n = word.length
    val bestCost = new Array[Long](n + 1)
    val bestPath = new Array[String](n + 1)
    bestPath(n) = ""
    var i = n - 1
    while (i >= 0) {
      var bc = Long.MaxValue
      var bp: String = null
      var l = 1
      while (l <= maxPieceLen && i + l <= n) {
        val rest = bestPath(i + l)
        if (rest != null) {
          pieceMap.get(word.substring(i, i + l)) match {
            case Some(c) =>
              val cand = c + bestCost(i + l)
              val candPath =
                if (rest.isEmpty) word.substring(i, i + l)
                else word.substring(i, i + l) + " " + rest
              if (cand < bc || (cand == bc && candPath.compareTo(bp) < 0)) {
                bc = cand; bp = candPath
              }
            case None =>
          }
        }
        l += 1
      }
      bestCost(i) = bc
      bestPath(i) = bp
      i -= 1
    }
    require(bestPath(0) != null, s"unsegmentable word: $word")
    (bestPath(0), bestCost(0))
  }

  /** Per-DISTINCT-word segmentation table: (word, pieces, n_pieces,
    * cost_micro). Corpus-independent work: |vocab| rows. */
  def segments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(split(col("text"), " ")).as("word")).distinct()
      .as[String]
      .mapPartitions { it =>
        it.map { w =>
          val (path, cost) = segmentWord(w)
          (w, path, path.count(_ == ' ').toLong + 1L, cost)
        }
      }
      .toDF("word", "pieces", "n_pieces", "cost_micro")
  }

  /** Per-doc tokenization stats off the segmentation table: word count,
    * piece count, fertility (pieces per word, integer micros, floor div so
    * no FP crosses the oracle boundary). */
  def docFertility(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(broadcast(segments(docs).select(col("word"), col("n_pieces"))),
        Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces")).as("n_pieces"))
      .withColumn("fertility_micro",
        expr("n_pieces * 1000000 div n_words"))

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_unigram_segment" -> ((s, dir) => Util.orderAll(segments(docs(s, dir)))),
    "text_unigram_tokens" -> ((s, dir) => Util.orderAll(docFertility(docs(s, dir)))))

  /** VALUES splice of [[pieceTable]] — generated from the same Seq the DP
    * reads, so the two sides cannot drift. */
  private def pieceValuesSql: String =
    pieceTable.map { case (p, c) => s"('$p', $c)" }.mkString(", ")

  /** Enumerate-all-segmentations CTE chain (recursive), ending in `best`:
    * one row per word with rk = 1 on (cost, path). */
  private def segCte: String =
    s"""WITH RECURSIVE w AS (
       |  SELECT DISTINCT unnest(string_split(text, ' ')) AS word FROM documents
       |), pc AS (
       |  SELECT piece, cost_micro FROM (VALUES $pieceValuesSql) t(piece, cost_micro)
       |), seg AS (
       |  SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS path,
       |    CAST(0 AS BIGINT) AS cost
       |  FROM w
       |  UNION ALL
       |  SELECT s.word, s.pos + CAST(len(p.piece) AS INTEGER),
       |    CASE WHEN s.path = '' THEN p.piece ELSE s.path || ' ' || p.piece END,
       |    s.cost + p.cost_micro
       |  FROM seg s JOIN pc p ON substr(s.word, s.pos, len(p.piece)) = p.piece
       |  WHERE s.pos <= len(s.word)
       |), full_seg AS (
       |  SELECT word, path, cost FROM seg WHERE pos = len(word) + 1
       |), best AS (
       |  SELECT word, path, cost,
       |    row_number() OVER (PARTITION BY word ORDER BY cost ASC, path ASC) AS rk
       |  FROM full_seg
       |)
       |""".stripMargin

  def oracle: Map[String, String] = Map(
    "text_unigram_segment" -> (segCte + Util.wrap(
      """SELECT word, path AS pieces,
        |  CAST(len(path) - len(replace(path, ' ', '')) + 1 AS BIGINT) AS n_pieces,
        |  cost AS cost_micro
        |FROM best WHERE rk = 1""".stripMargin,
      Seq("word"))),

    "text_unigram_tokens" -> (segCte +
      """, segt AS (
        |  SELECT word,
        |    CAST(len(path) - len(replace(path, ' ', '')) + 1 AS BIGINT) AS n_pieces
        |  FROM best WHERE rk = 1
        |), tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |)
        |""".stripMargin + Util.wrap(
      """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
        |  CAST((sum(n_pieces) * 1000000) // count(*) AS BIGINT) AS fertility_micro
        |FROM tok JOIN segt USING (word)
        |GROUP BY doc_id""".stripMargin,
      Seq("doc_id"))))
}
