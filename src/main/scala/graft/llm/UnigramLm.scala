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
  private[graft] def segmentWord(word: String): (String, Long) =
    segmentWordWith(pieceMap, maxPieceLen, word)

  /** [[segmentWord]] against an ARBITRARY piece table — what the EM
    * trainer's per-round E-step runs (the pinned [[pieceTable]] is just
    * one instance). Same determinism contract: (cost, path) minimum,
    * lexicographic path tie-break. */
  private[graft] def segmentWordWith(pieces: Map[String, Long], maxLen: Int,
                                     word: String): (String, Long) = {
    val n = word.length
    val bestCost = new Array[Long](n + 1)
    val bestPath = new Array[String](n + 1)
    bestPath(n) = ""
    var i = n - 1
    while (i >= 0) {
      var bc = Long.MaxValue
      var bp: String = null
      var l = 1
      while (l <= maxLen && i + l <= n) {
        val rest = bestPath(i + l)
        if (rest != null) {
          pieces.get(word.substring(i, i + l)) match {
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
  def segments(docs: DataFrame): DataFrame =
    segmentsWith(docs, pieceMap)

  /** [[segments]] under an ARBITRARY piece table — the apply half of the
    * EM trainer ([[trainPieceTable]]'s output consumed the way the
    * pinned table is), ONE DP harness for both. The table is a broadcast
    * (the SentencePiece-sized bounded state every apply path here
    * carries); the work stays |distinct words|. */
  def segmentsWith(docs: DataFrame, pieces: Map[String, Long]): DataFrame = {
    require(pieces.nonEmpty, "segmentsWith: empty piece table")
    val spark = docs.sparkSession
    import spark.implicits._
    val maxL = pieces.keysIterator.map(_.length).max
    val bc = spark.sparkContext.broadcast(pieces)
    docs.select(explode(split(col("text"), " ")).as("word")).distinct()
      .as[String]
      .mapPartitions { it =>
        it.map { w =>
          val (path, cost) = segmentWordWith(bc.value, maxL, w)
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

  // --------------------------------------------------- EM piece training

  /** Fixed unrolled-round knobs — shared by the trainer and its oracle. */
  val TrainPieceLen = 4
  val TrainMinSeed = 3L
  val TrainRounds = 2

  private def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  /** Unigram-LM piece-table TRAINING — the other half of the SentencePiece
    * pair next to [[segments]]' apply: seed a candidate vocabulary from
    * corpus substring statistics, then run [[TrainRounds]] Viterbi-EM
    * rounds (E-step: min-cost segmentation of every DISTINCT word under
    * the current costs; M-step: re-cost every piece from its
    * corpus-weighted usage; prune: multi-char pieces the E-step never
    * used are dropped, single chars are floored at usage 1 so
    * segmentation stays total). Returns (piece, usage, cost_micro).
    *
    * Costs are integer OCTAVES — `(bitlen(total) − bitlen(count)) · 10⁶`,
    * a quantized −log₂ p in micros computed with `length(bin(n)) − 1` on
    * both engines — the repo's deliberately log-free discipline
    * ([[TextAnalysis.bigramLm]]'s argument: libm `ln` is not
    * IEEE-exact across engines, bit length is). Octave granularity costs
    * resolution, never determinism; ties fall to the DP's lexicographic
    * path rule. The DuckDB oracle replays the unrolled rounds and does
    * NOT trust the DP: each round's E-step is the enumerate-every-
    * segmentation recursive CTE (the [[segments]] oracle's discipline).
    *
    * Scale shape (100 TB): every per-word step runs over DISTINCT words
    * (the Zipf collapse all of [[BpeTrainer]] rides); the seed substring
    * explode is ≤ len·[[TrainPieceLen]] rows per distinct word with a
    * map-side-combining count; per round, ONE mapPartitions E-step over
    * the word table + one usage aggregation. Driver state is the piece
    * table itself once per round (the bounded-collect convention —
    * SentencePiece holds exactly this table in memory; `minSeedCount`
    * caps it, and real deployments raise it with the corpus). */
  def trainPieceTable(docs: DataFrame, maxPieceLen: Int = TrainPieceLen,
                      minSeedCount: Long = TrainMinSeed,
                      rounds: Int = TrainRounds,
                      maxSeedPieces: Long = 1L << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wf = docs.select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("f"))
      .localCheckpoint(eager = true) // one consumer per round + the seed
    // seed candidates: every substring of length 1..maxPieceLen of every
    // distinct word, occurrence-counted (overlapping), corpus-weighted
    val sub = wf.select(col("f"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(i + ${maxPieceLen - 1}, length(word))), j ->
           |    substring(word, i, j - i + 1))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum(col("f")).as("cnt"))
    val seedDf = sub
      .filter(length(col("piece")) === 1 || col("cnt") >= minSeedCount)
    // bounded-collect GUARD: the docstring's "minSeedCount caps it" is a
    // knob, not a bound — at real corpus scale the substrings occurring
    // >= 3 times vastly outnumber the final piece table, and an unbounded
    // collect would OOM the driver before any require could fire (advisor
    // r13). ONE job: limit(cap+1) bounds the transfer (a separate count()
    // would re-run the substring-explode shuffle — review-caught), and an
    // over-cap table fails LOUDLY with the remedy in the message; real
    // deployments raise minSeedCount with the corpus (SentencePiece's own
    // seed_sentencepiece_size discipline — maxSeedPieces defaults to its
    // 1M scale). Under the cap, limit(cap+1) returns the COMPLETE set, so
    // training is unchanged.
    val seed: Array[(String, Long)] = seedDf
      .limit(math.min(maxSeedPieces + 1L, Int.MaxValue.toLong).toInt)
      .as[(String, Long)].collect()
    require(seed.length <= maxSeedPieces,
      s"trainPieceTable: seed candidate table exceeds " +
        s"maxSeedPieces=$maxSeedPieces — raise minSeedCount (now " +
        s"$minSeedCount) so the driver-held piece table stays bounded")
    val singles: Set[String] = seed.iterator.map(_._1).filter(_.length == 1).toSet
    def costsOf(counts: Map[String, Long]): Map[String, Long] = {
      val tb = bitlen(counts.valuesIterator.sum)
      counts.map { case (p, c) => p -> (tb - bitlen(c)).toLong * 1000000L }
    }
    var counts: Map[String, Long] = seed.toMap
    var table: Map[String, Long] = costsOf(counts)
    for (_ <- 1 to rounds) {
      val bc = spark.sparkContext.broadcast(table)
      val usage: Map[String, Long] = wf.as[(String, Long)]
        .flatMap { case (w, f) =>
          segmentWordWith(bc.value, maxPieceLen, w)._1
            .split(' ').iterator.map(p => (p, f))
        }
        .groupBy(col("_1").as("piece")).agg(sum(col("_2")).as("u"))
        .as[(String, Long)].collect().toMap
      // prune: unused multis vanish; singles floor at 1 (totality)
      counts = usage ++ singles.filterNot(usage.contains).map(_ -> 1L)
      table = costsOf(counts)
    }
    counts.toSeq.map { case (p, u) => (p, u, table(p)) }
      .toDF("piece", "usage", "cost_micro")
  }

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_unigram_segment" -> ((s, dir) => Util.orderAll(segments(docs(s, dir)))),
    "text_unigram_tokens" -> ((s, dir) => Util.orderAll(docFertility(docs(s, dir)))),
    "text_unigram_train" -> ((s, dir) =>
      Util.orderAll(trainPieceTable(docs(s, dir)))),
    // the trained table APPLIED — train → collect the piece table (the
    // SentencePiece-sized bounded state) → segment every distinct word
    // under it; the oracle replays the train chain and enumerates a
    // THIRD round's segmentations against the final costs
    "text_unigram_train_segment" -> ((s, dir) => {
      val d = docs(s, dir)
      val spark = s
      import spark.implicits._
      val tbl = trainPieceTable(d)
        .select(col("piece"), col("cost_micro"))
        .as[(String, Long)].collect().toMap
      Util.orderAll(segmentsWith(d, tbl))
    }))

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

  /** One EM round in DuckDB: enumerate-every-segmentation E-step against
    * the previous round's piece table `$prev` (the [[segCte]] discipline —
    * never trust the DP), usage aggregation, floor/prune, octave re-cost.
    * Namespaced by round so the unrolled chain composes. */
  /** Enumeration-only E-step CTEs (seg$r → best$r, cost retained) — the
    * never-trust-the-DP discipline, shared by the training rounds and
    * the trained-table apply oracle. */
  private def enumCtes(r: Int, prev: String): String =
    s""", seg$r AS (
       |  SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS path, CAST(0 AS BIGINT) AS cost
       |  FROM wf
       |  UNION ALL
       |  SELECT s.word, s.pos + CAST(len(p.piece) AS INTEGER),
       |    CASE WHEN s.path = '' THEN p.piece ELSE s.path || ' ' || p.piece END,
       |    s.cost + p.cost_micro
       |  FROM seg$r s JOIN $prev p ON substr(s.word, s.pos, len(p.piece)) = p.piece
       |  WHERE s.pos <= len(s.word)
       |), best$r AS MATERIALIZED (
       |  SELECT word, path, cost FROM (
       |    SELECT word, path, cost,
       |      row_number() OVER (PARTITION BY word ORDER BY cost ASC, path ASC) AS rk
       |    FROM seg$r WHERE pos = len(word) + 1) q
       |  WHERE rk = 1
       |)
       |""".stripMargin

  private def trainRoundCtes(r: Int, prev: String): String =
    enumCtes(r, prev) +
    s""", use$r AS MATERIALIZED (
       |  SELECT piece, CAST(sum(f) AS BIGINT) AS u FROM (
       |    SELECT b.word, unnest(string_split(b.path, ' ')) AS piece
       |    FROM best$r b) s
       |  JOIN wf USING (word) GROUP BY 1
       |), pu$r AS MATERIALIZED (
       |  SELECT piece, u FROM use$r WHERE len(piece) > 1
       |  UNION ALL
       |  SELECT s.piece, coalesce(u.u, CAST(1 AS BIGINT)) AS u
       |  FROM (SELECT piece FROM p0 WHERE len(piece) = 1) s
       |  LEFT JOIN use$r u USING (piece)
       |), c$r AS MATERIALIZED (
       |  SELECT piece, u AS usage,
       |    CAST((len(bin(CAST((SELECT sum(u) FROM pu$r) AS BIGINT)))
       |          - len(bin(u))) * 1000000 AS BIGINT) AS cost_micro
       |  FROM pu$r
       |)
       |""".stripMargin

  /** The trainer replayed: substring seed, octave seed costs, then
    * [[TrainRounds]] unrolled rounds. */
  private def trainSql: String =
    trainSqlPrefix + Util.wrap(
      s"SELECT piece, usage, cost_micro FROM c$TrainRounds",
      Seq("piece", "usage", "cost_micro"))

  /** The shared CTE chain through the final piece table `c$TrainRounds`. */
  private def trainSqlPrefix: String =
    s"""WITH RECURSIVE wf AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS f
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
       |  WHERE length(word) >= 1 GROUP BY 1
       |), sub AS MATERIALIZED (
       |  SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
       |    CAST(sum(f) AS BIGINT) AS cnt
       |  FROM wf,
       |    LATERAL (SELECT unnest(range(1, len(word) + 1)) AS i) ii,
       |    LATERAL (SELECT unnest(range(1, $TrainPieceLen + 1)) AS l) ll
       |  WHERE i + l <= len(word) + 1
       |  GROUP BY 1
       |), p0 AS MATERIALIZED (
       |  SELECT piece, cnt FROM sub
       |  WHERE len(piece) = 1 OR cnt >= $TrainMinSeed
       |), c0 AS MATERIALIZED (
       |  SELECT piece,
       |    CAST((len(bin(CAST((SELECT sum(cnt) FROM p0) AS BIGINT)))
       |          - len(bin(cnt))) * 1000000 AS BIGINT) AS cost_micro
       |  FROM p0
       |)
       |""".stripMargin +
      (1 to TrainRounds).map(r => trainRoundCtes(r, s"c${r - 1}")).mkString

  /** The train chain + one more enumeration round against the FINAL
    * costs — [[segmentsWith]] over the trained table, never trusting
    * either DP. */
  private def trainSegmentSql: String = {
    val r = TrainRounds + 1
    trainSqlPrefix + enumCtes(r, s"c$TrainRounds") + Util.wrap(
      s"""SELECT word, path AS pieces,
         |  CAST(len(path) - len(replace(path, ' ', '')) + 1 AS BIGINT) AS n_pieces,
         |  cost AS cost_micro
         |FROM best$r""".stripMargin,
      Seq("word"))
  }

  def oracle: Map[String, String] = Map(
    "text_unigram_train" -> trainSql,
    "text_unigram_train_segment" -> trainSegmentSql,

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
