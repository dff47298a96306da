package graft.llm

import graft.{Tables, Util}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter 1969) — entity resolution
  * for STRUCTURED records, the metadata companion to the text/embedding
  * dedup families: a training-data pipeline that ingests the same corpus
  * from two providers (or two crawl snapshots with re-keyed metadata) has
  * to decide "same underlying record?" from noisy field agreement, not from
  * a shared key.
  *
  * Model: for each candidate pair, an agreement vector over the compared
  * fields; each field contributes a log-odds weight — log(m/u) on
  * agreement, log((1-m)/(1-u)) on disagreement, where m = P(agree | match)
  * and u = P(agree | non-match) — and the pair's score is the sum;
  * thresholds split match / possible (clerical review) / non-match. The
  * weights here are PINNED integer milli-log-odds constants (the same
  * pinned-table convention as the nDCG discount table): every score is a
  * BIGINT sum of constants, every gate an integer compare, so the DuckDB
  * oracle replays the classification bit-identically — no FP boundary can
  * flip a class cross-engine.
  *
  * Scale shape: candidates come from BLOCKING (equi-join on a stable
  * blocking key), never all-pairs — Σ|block_a|·|block_b| comparisons, the
  * structured-record analogue of LSH banding. Comparison cost per pair is
  * O(min-length): the only non-trivial comparator is the codegen'd
  * [[graft.functions.EditWithinOne]] two-pointer scan — exact for the
  * threshold-1 question and allocation-free, where a generic Levenshtein
  * DP measured ~10 s of pure comparator time on the 9M-pair sf0.1 block
  * join — applied as the join residual so the non-candidate bulk dies
  * before any scoring work. Production corpora use
  * multiple blocking passes unioned (the [[Dedup.snmPairsMultiPass]]
  * pattern) so a record with one corrupted blocking field is still
  * reachable through another pass; the fixture's single stable key keeps
  * the oracle join 1:1 with the Spark plan. A skewed blocking key (one
  * giant block) is the same failure mode as an LSH hot bucket — the
  * mitigation ladder (salting the comparison join, capping block size,
  * exact-dedup first) is measured in SCALE.md and applies unchanged.
  *
  * Fixture linkage task: `customer` against a deterministically corrupted
  * twin of itself — name truncated by one char for custkey % 3 == 0 (one
  * edit), mktsegment wiped to UNKNOWN for % 5 == 0, balance perturbed by
  * (custkey % 7 - 3)·25 cents. Every corruption is integer/string-exact,
  * so the oracle rebuilds the identical dirty side. The task is genuinely
  * ambiguous, not a toy, because serial-number names collide under edit
  * distance two ways: any two keys differing in ONE digit position are
  * within one substitution ("Customer#000000001" ~ "Customer#000000601"),
  * and "Customer#00000001x" all truncate to "Customer#00000001", one
  * deletion from the clean "Customer#000000010". So name agreement alone
  * produces real false candidates inside a block — at sf0.01 the match
  * class is ~86% precise and the clerical band is mostly false pairs —
  * and [[linkEval]] quantifies exactly how the composite score separates
  * them (a same-digit neighbor rarely also agrees on segment AND balance).
  * Ground truth (clean key == dirty key) is known by construction, which
  * is what makes the eval possible.
  */
object RecordLinkage {

  /** Pinned integer milli-log-odds weights. A name within one edit is a
    * near-certain match signal (m≈0.95, u≈1/block); segment and balance
    * are weak corroborators. Values are frozen constants — changing them
    * changes classifications, so they version with the operator. */
  val WNameAgree = 12000L
  val WNameDis = -4000L
  val WMktAgree = 1800L
  val WMktDis = -1200L
  val WBalAgree = 1500L
  val WBalDis = -1000L

  /** Class thresholds: `match` requires the name signal plus at least one
    * corroborator surviving; `possible` is the clerical-review band. */
  val MatchMin = 10000L
  val PossibleMin = 2500L

  /** Clean side: (key, name, blocking key, balance in exact integer cents,
    * segment). Cents via round(×100) — the fixture's 2-decimal doubles are
    * not binary-exact, the snapped cents are. */
  def cleanSide(customers: DataFrame): DataFrame =
    customers.select(
      col("c_custkey").as("cust_a"),
      col("c_name").as("a_name"),
      col("c_nationkey").cast("long").as("nk"),
      round(col("c_acctbal") * 100).cast("long").as("a_cents"),
      col("c_mktsegment").as("a_mkt"))

  /** Deterministically corrupted twin — the "second provider" snapshot. */
  def dirtySide(customers: DataFrame): DataFrame =
    customers.select(
      col("c_custkey").as("cust_b"),
      when(col("c_custkey") % 3 === 0,
        expr("substring(c_name, 1, length(c_name) - 1)"))
        .otherwise(col("c_name")).as("b_name"),
      col("c_nationkey").cast("long").as("nk"),
      (round(col("c_acctbal") * 100).cast("long") +
        (col("c_custkey") % 7 - 3) * 25).as("b_cents"),
      when(col("c_custkey") % 5 === 0, lit("UNKNOWN"))
        .otherwise(col("c_mktsegment")).as("b_mkt"))

  /** Harder twin for the multi-pass demonstration: additionally corrupts
    * the BLOCKING field itself — every custkey % 11 == 0 record is filed
    * under another nation ((nk + 7) mod 25 ≠ nk always, 7 coprime to 25).
    * Single-key blocking can NEVER recover these twins: no comparator,
    * however good, sees a pair the blocker already dropped. */
  def dirtySideNkCorrupt(customers: DataFrame): DataFrame =
    dirtySide(customers).withColumn("nk",
      when(col("cust_b") % 11 === 0, (col("nk") + 7) % 25).otherwise(col("nk")))

  /** Balance bucket for the second blocking pass. Width 1000 cents ≫ the
    * 75-cent perturbation bound, so a record and its twin always land in
    * the same or adjacent buckets (truncating division's double-width
    * bucket at zero only widens intervals — completeness is interval
    * width ≥ 1000 > 75, which still holds). */
  val BucketCents = 1000L

  private def weight(agree: Column, w: Long, wDis: Long): Column =
    when(agree, lit(w)).otherwise(lit(wDis))

  /** Comparator gate + agreement scoring + classification over a candidate
    * set. The name comparator runs FIRST (derived gate: a pair that fails
    * it scores at most WNameDis + WMktAgree + WBalAgree, which sits below
    * the clerical band — so the O(|block|²) bulk is discarded before any
    * scoring work; the require keeps the derivation honest if the pinned
    * weights are ever re-tuned). */
  private[graft] def scoreCandidates(cands: DataFrame): DataFrame = {
    require(WNameDis + WMktAgree + WBalAgree < PossibleMin,
      "name-gate pushdown invalid: a name-disagreeing pair could reach the band")
    cands
      // edit ≤ 1, exact, via the codegen'd two-pointer scan — a generic
      // thresholded-Levenshtein DP here measured ~10 s of pure comparator
      // time on the 9M-pair sf0.1 block join (SCALE.md r8)
      .filter(graft.functions.StringFunctions.editWithin1(col("a_name"), col("b_name")))
      .withColumn("agree_name", lit(1L))
      .withColumn("agree_mkt", (col("a_mkt") === col("b_mkt")).cast("long"))
      .withColumn("agree_bal", (abs(col("a_cents") - col("b_cents")) <= 50).cast("long"))
      .withColumn("score",
        lit(WNameAgree) +
          weight(col("agree_mkt") === 1, WMktAgree, WMktDis) +
          weight(col("agree_bal") === 1, WBalAgree, WBalDis))
      .withColumn("cls",
        when(col("score") >= MatchMin, lit("match"))
          .when(col("score") >= PossibleMin, lit("possible"))
          .otherwise(lit("nonmatch")))
      .filter(col("cls") =!= "nonmatch")
      .select(col("cust_a"), col("cust_b"), col("agree_name"),
        col("agree_mkt"), col("agree_bal"), col("score"), col("cls"))
  }

  private val pairCols = Seq("cust_a", "a_name", "a_cents", "a_mkt",
    "cust_b", "b_name", "b_cents", "b_mkt").map(col)

  /** Blocked candidate generation + scoring. Emits only match/possible
    * pairs (the non-match bulk — the whole point of scoring — is dropped
    * where it is cheapest, before the shuffle to the sink). */
  def linkPairs(customers: DataFrame): DataFrame =
    scoreCandidates( // blocking join: Σ|block|² candidates, never all-pairs
      cleanSide(customers).join(dirtySide(customers), "nk"))

  /** Multi-pass blocking against the blocking-field-corrupted twin: pass 1
    * blocks on nation, pass 2 on the balance bucket WITH NEIGHBOR
    * EXPANSION (the dirty side probes buckets {b-1, b, b+1}, keeping the
    * pass an equi-join — never a range/theta join — while staying complete
    * for the ≤75-cent perturbation). Union, pair-dedup, then one shared
    * scoring stage. This is the production answer to "what if the blocking
    * key itself is dirty": no single pass can be trusted, and each extra
    * pass costs only its own Σ|block|² — the [[Dedup.snmPairsMultiPass]]
    * pattern for structured records. */
  def linkPairsMultiPass(customers: DataFrame): DataFrame = {
    val a = cleanSide(customers)
      .withColumn("bucket", expr(s"a_cents div $BucketCents"))
    val b = dirtySideNkCorrupt(customers)
      .withColumn("bucket", expr(s"b_cents div $BucketCents"))
    // the comparator gate runs per PASS, before the union's pair-dedup:
    // the dedup is a shuffle on the pair key, and Catalyst cannot push a
    // non-key filter below that aggregate — unfiltered it moves the full
    // Σ|block|² candidate width (measured 21 s vs ~2 s at sf0.1, the
    // shuffle carrying ~9.6M full-width rows the comparator was about to
    // discard anyway). scoreCandidates re-checks the gate on the ~10³
    // survivors for free.
    val gate = (d: DataFrame) => d.filter(
      graft.functions.StringFunctions.editWithin1(col("a_name"), col("b_name")))
    val pass1 = gate(a.join(b, "nk").select(pairCols: _*))
    val pass2 = gate(a.join(
      b.withColumn("bucket",
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1))),
      "bucket").select(pairCols: _*))
    scoreCandidates(
      pass1.unionByName(pass2).dropDuplicates("cust_a", "cust_b"))
  }

  /** Recall of true twins (clean key == dirty key) against the
    * blocking-corrupted twin, single-pass vs multi-pass — the measurement
    * that justifies the second pass: records filed under the wrong nation
    * are unreachable by nation blocking alone, and the balance pass buys
    * them back. */
  def linkRecall(customers: DataFrame): DataFrame = {
    val a = cleanSide(customers)
    val b = dirtySideNkCorrupt(customers)
    val single = scoreCandidates(a.join(b, "nk").select(pairCols: _*))
      .filter(col("cust_a") === col("cust_b"))
      .agg(count(lit(1)).as("n_true_found"))
      .withColumn("mode", lit("single_pass"))
    val multi = linkPairsMultiPass(customers)
      .filter(col("cust_a") === col("cust_b"))
      .agg(count(lit(1)).as("n_true_found"))
      .withColumn("mode", lit("multi_pass"))
    single.unionByName(multi)
  }

  /** Linkage quality vs the by-construction ground truth: confusion counts
    * by (class, is the pair a true link) plus the per-cell score range —
    * the report a clerical-review planner reads. The denominator for
    * recall is |customers| (every record has exactly one true twin).
    *
    * `sampleMod` is the production arm (the [[Dedup.dedupEval]] pattern):
    * at 100 TB nobody evals the full link table — a deterministic 1/mod
    * key-hash slice of the CLEAN side is taken before blocking, so the
    * whole candidate/score pipeline (not just the report) shrinks by the
    * sample rate while the dirty side stays whole (sampling both sides
    * would square the hit rate and silently zero recall). Default 1 keeps
    * the full-corpus form the oracle pins. */
  def linkEval(customers: DataFrame, sampleMod: Long = 1L): DataFrame = {
    require(sampleMod >= 1, s"linkEval: sampleMod must be >= 1, got $sampleMod")
    val a0 = cleanSide(customers)
    val a = if (sampleMod == 1L) a0
      else a0.filter(pmod(xxhash64(col("cust_a")), lit(sampleMod)) === 0)
    scoreCandidates(a.join(dirtySide(customers), "nk"))
      .withColumn("is_true", (col("cust_a") === col("cust_b")).cast("long"))
      .groupBy(col("cls"), col("is_true"))
      .agg(count(lit(1)).as("n"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
  }

  private def cust(s: SparkSession, dir: String) = Tables.table(s, dir, "customer")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rec_link_fs" -> ((s, dir) => Util.orderAll(linkPairs(cust(s, dir)))),
    "rec_link_eval" -> ((s, dir) => Util.orderAll(linkEval(cust(s, dir)))),
    "rec_link_multipass" -> ((s, dir) => Util.orderAll(linkPairsMultiPass(cust(s, dir)))),
    "rec_link_recall" -> ((s, dir) => Util.orderAll(linkRecall(cust(s, dir)))))

  /** Shared oracle CTE chain: rebuild both sides, block, score, classify —
    * in pinned integer arithmetic identical to the Spark side. */
  private val scoredCte: String =
    s"""WITH clean AS (
       |  SELECT c_custkey AS cust_a, c_name AS a_name,
       |    CAST(c_nationkey AS BIGINT) AS nk,
       |    CAST(round(c_acctbal * 100) AS BIGINT) AS a_cents,
       |    c_mktsegment AS a_mkt
       |  FROM customer
       |), dirty AS (
       |  SELECT c_custkey AS cust_b,
       |    CASE WHEN c_custkey % 3 = 0
       |         THEN substr(c_name, 1, length(c_name) - 1) ELSE c_name END AS b_name,
       |    CAST(c_nationkey AS BIGINT) AS nk,
       |    CAST(round(c_acctbal * 100) AS BIGINT) + (c_custkey % 7 - 3) * 25 AS b_cents,
       |    CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS b_mkt
       |  FROM customer
       |), scored AS (
       |  SELECT cust_a, cust_b,
       |    CASE WHEN levenshtein(a_name, b_name) <= 1 THEN 1 ELSE 0 END AS agree_name,
       |    CASE WHEN a_mkt = b_mkt THEN 1 ELSE 0 END AS agree_mkt,
       |    CASE WHEN abs(a_cents - b_cents) <= 50 THEN 1 ELSE 0 END AS agree_bal
       |  FROM clean JOIN dirty USING (nk)
       |), graded AS (
       |  SELECT cust_a, cust_b, agree_name, agree_mkt, agree_bal,
       |    CAST(CASE WHEN agree_name = 1 THEN $WNameAgree ELSE $WNameDis END +
       |         CASE WHEN agree_mkt = 1 THEN $WMktAgree ELSE $WMktDis END +
       |         CASE WHEN agree_bal = 1 THEN $WBalAgree ELSE $WBalDis END AS BIGINT) AS score
       |  FROM scored
       |), classed AS (
       |  SELECT *, CASE WHEN score >= $MatchMin THEN 'match'
       |                 WHEN score >= $PossibleMin THEN 'possible'
       |                 ELSE 'nonmatch' END AS cls
       |  FROM graded
       |)""".stripMargin

  /** Multi-pass oracle chain: the blocking-corrupted twin, both blocking
    * passes (the balance pass as an explicit bucket BETWEEN — same pair
    * set as Spark's neighbor-explode equi-join), full-row DISTINCT for the
    * pair dedup, then the same pinned scoring. */
  private val multiCte: String =
    s"""WITH clean AS (
       |  SELECT c_custkey AS cust_a, c_name AS a_name,
       |    CAST(c_nationkey AS BIGINT) AS nk,
       |    CAST(round(c_acctbal * 100) AS BIGINT) AS a_cents,
       |    c_mktsegment AS a_mkt
       |  FROM customer
       |), dirty AS (
       |  SELECT c_custkey AS cust_b,
       |    CASE WHEN c_custkey % 3 = 0
       |         THEN substr(c_name, 1, length(c_name) - 1) ELSE c_name END AS b_name,
       |    CASE WHEN c_custkey % 11 = 0
       |         THEN (CAST(c_nationkey AS BIGINT) + 7) % 25
       |         ELSE CAST(c_nationkey AS BIGINT) END AS nk,
       |    CAST(round(c_acctbal * 100) AS BIGINT) + (c_custkey % 7 - 3) * 25 AS b_cents,
       |    CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS b_mkt
       |  FROM customer
       |), cand AS (
       |  SELECT DISTINCT cust_a, a_name, a_cents, a_mkt,
       |                  cust_b, b_name, b_cents, b_mkt
       |  FROM (
       |    SELECT cust_a, a_name, a_cents, a_mkt, cust_b, b_name, b_cents, b_mkt
       |    FROM clean JOIN dirty USING (nk)
       |    UNION ALL
       |    SELECT cust_a, a_name, a_cents, a_mkt, cust_b, b_name, b_cents, b_mkt
       |    FROM clean a JOIN dirty d
       |      ON a.a_cents // $BucketCents BETWEEN d.b_cents // $BucketCents - 1
       |                                       AND d.b_cents // $BucketCents + 1
       |  ) u
       |), scored AS (
       |  SELECT cust_a, cust_b,
       |    CASE WHEN levenshtein(a_name, b_name) <= 1 THEN 1 ELSE 0 END AS agree_name,
       |    CASE WHEN a_mkt = b_mkt THEN 1 ELSE 0 END AS agree_mkt,
       |    CASE WHEN abs(a_cents - b_cents) <= 50 THEN 1 ELSE 0 END AS agree_bal
       |  FROM cand
       |), graded AS (
       |  SELECT cust_a, cust_b, agree_name, agree_mkt, agree_bal,
       |    CAST(CASE WHEN agree_name = 1 THEN $WNameAgree ELSE $WNameDis END +
       |         CASE WHEN agree_mkt = 1 THEN $WMktAgree ELSE $WMktDis END +
       |         CASE WHEN agree_bal = 1 THEN $WBalAgree ELSE $WBalDis END AS BIGINT) AS score
       |  FROM scored
       |), classed AS (
       |  SELECT *, CASE WHEN score >= $MatchMin THEN 'match'
       |                 WHEN score >= $PossibleMin THEN 'possible'
       |                 ELSE 'nonmatch' END AS cls
       |  FROM graded
       |)""".stripMargin

  def oracle: Map[String, String] = Map(
    "rec_link_fs" -> (scoredCte +
      s"""
         |SELECT CAST(agree_name AS BIGINT) AS agree_name,
         |  CAST(agree_mkt AS BIGINT) AS agree_mkt,
         |  CAST(agree_bal AS BIGINT) AS agree_bal,
         |  cls, cust_a, cust_b, score
         |FROM classed WHERE cls <> 'nonmatch'
         |${Util.ob("cust_a", "cust_b", "agree_name", "agree_mkt", "agree_bal", "score", "cls")}""".stripMargin),
    "rec_link_eval" -> (scoredCte +
      s"""
         |SELECT cls,
         |  CAST(CASE WHEN cust_a = cust_b THEN 1 ELSE 0 END AS BIGINT) AS is_true,
         |  count(*) AS n, min(score) AS min_score, max(score) AS max_score
         |FROM classed WHERE cls <> 'nonmatch'
         |GROUP BY 1, 2
         |${Util.ob("cls", "is_true", "n", "min_score", "max_score")}""".stripMargin),
    "rec_link_multipass" -> (multiCte +
      s"""
         |SELECT CAST(agree_name AS BIGINT) AS agree_name,
         |  CAST(agree_mkt AS BIGINT) AS agree_mkt,
         |  CAST(agree_bal AS BIGINT) AS agree_bal,
         |  cls, cust_a, cust_b, score
         |FROM classed WHERE cls <> 'nonmatch'
         |${Util.ob("cust_a", "cust_b", "agree_name", "agree_mkt", "agree_bal", "score", "cls")}""".stripMargin),
    // single-pass recall derived inside the multipass chain: a TRUE pair is
    // reachable by nation blocking iff its blocking key survived corruption
    // (cust % 11 <> 0) — same numbers the Spark side gets by executing the
    // single-pass join, because class does not depend on the finding pass
    "rec_link_recall" -> (multiCte +
      s"""
         |SELECT mode, n_true_found FROM (
         |  SELECT 'multi_pass' AS mode, count(*) AS n_true_found
         |  FROM classed WHERE cls <> 'nonmatch' AND cust_a = cust_b
         |  UNION ALL
         |  SELECT 'single_pass' AS mode, count(*) AS n_true_found
         |  FROM classed WHERE cls <> 'nonmatch' AND cust_a = cust_b AND cust_a % 11 <> 0
         |) u
         |${Util.ob("mode", "n_true_found")}""".stripMargin))
}
