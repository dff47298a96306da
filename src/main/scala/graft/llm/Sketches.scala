package graft.llm

import graft.{Tables, Util}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch/estimation operators for corpus-scale diagnostics — the "how big
  * is this really" questions a 100 TB pipeline asks before it commits to a
  * plan (vocabulary size per language, mixture rebalancing targets,
  * model-free document vectors).
  *
  * Everything here follows the repo's oracle-parity discipline: hashes are
  * multiplicative arithmetic over vocabulary ids (dense-rank over the
  * distinct token set) so DuckDB reproduces results bit-for-bit, with the
  * engine-hash (`xxhash64`) twin as the unbounded-vocabulary production
  * path where it matters — the same base-encoded/hashed split as
  * [[Dedup.shingleIds]]/[[Dedup.shingleIdsHashed]].
  */
object Sketches {

  /** Hash space for the KMV sketch: a prime near 2^40 — big enough that
    * 64-th-minimum estimates don't quantize, small enough that
    * (k-1)·M stays far from Long overflow. */
  val KmvSpace: Long = 1099511627791L

  /** K-minimum-values distinct-count sketch, per language: how many
    * DISTINCT tokens does each language's sub-corpus use, estimated from
    * only the k smallest token hashes.
    *
    * The estimator is the classic KMV/bottom-k: hash every distinct
    * (lang, token) into [0, M), keep each language's k smallest hashes;
    * if fewer than k exist the count is exact, otherwise
    * est = (k−1)·M / h_k (uniform order statistics: the k-th minimum of n
    * uniform draws sits near k·M/n). All arithmetic is integer, so the
    * estimate is deterministic across engines.
    *
    * Scale shape: one distinct shuffle on (lang, token-hash) — the shuffle
    * carries 16-byte keys, never texts — then the per-language k-smallest
    * is a rank-filter window that Spark lowers to WindowGroupLimit: each
    * map task pre-trims to its local k before the exchange, so the sorted
    * side of the window sees ≤ k·#partitions rows per language, not the
    * vocabulary. At 100 TB you'd swap the vocab-id hash for xxhash64
    * (same algebra, no vocab table) — [[kmvDistinctHashed]], spec-compared
    * against the exact count. */
  def kmvDistinct(docs: DataFrame, k: Int = 64): DataFrame =
    kmvFromHashes(
      distinctTokens(docs)
        .join(broadcast(Dedup.vocab(Dedup.tokenized(docs))), "token")
        .select(col("lang"),
          expr(s"((tid % 3037000493) * 2654435761) % $KmvSpace").as("h")),
      k)

  /** [[kmvDistinct]] over `xxhash64(token)` — the unbounded-vocabulary
    * production path (no vocab table, no broadcast, one codegen'd pass).
    * Engine-specific hash ⇒ no DuckDB oracle; its accuracy is
    * spec-asserted against the exact distinct count instead. */
  def kmvDistinctHashed(docs: DataFrame, k: Int = 64): DataFrame =
    kmvFromHashes(
      distinctTokens(docs)
        .select(col("lang"), pmod(xxhash64(col("token")), lit(KmvSpace)).as("h")),
      k)

  private def distinctTokens(docs: DataFrame): DataFrame =
    docs.select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .distinct()

  private def kmvFromHashes(hashes: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val w = Window.partitionBy("lang").orderBy(col("h").asc)
    hashes.distinct() // hash collisions across tokens collapse, both engines
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1} * $KmvSpace) div hk")))
      .select(col("lang"), col("n_kept"), col("est_distinct"))
  }

  /** Model-free document vectors via the hashing trick (feature hashing):
    * every token occurrence lands in dim = hash(token) mod d with a ±1
    * sign from the next hash bit, summed per (doc, dim). Long-form output
    * (doc_id, dim, weight) — the assembled array twin feeds the ANN
    * operators (spec-wired); long form is what the oracle can mirror and
    * what a 100 TB pipeline would store columnar anyway.
    *
    * Scale shape: one map-side-combining aggregation on (doc_id, dim);
    * the multiplicative hash takes HIGH bits (div 65536) before the mod —
    * low bits of a Knuth multiplier cycle with small moduli and would fold
    * every token into a handful of dims. */
  def featureHashEmbed(docs: DataFrame, d: Int = 16): DataFrame = {
    require(d >= 2, s"featureHashEmbed needs d >= 2, got $d")
    Dedup.tokenized(docs)
      .select(col("doc_id"), explode(col("words")).as("token"))
      .join(broadcast(Dedup.vocab(Dedup.tokenized(docs))), "token")
      .withColumn("hb", expr(s"((tid % 3037000493) * 2654435761) div 65536"))
      .groupBy(col("doc_id"), expr(s"hb % $d").as("dim"))
      .agg(sum(when(expr(s"(hb div $d) % 2 = 0"), 1L).otherwise(-1L)).as("weight"))
      .select(col("doc_id"), col("dim"), col("weight"))
  }

  /** Temperature-resampled language mixture (α = 1/2): the standard
    * low-resource-upweighting used for multilingual training mixes —
    * sampling share ∝ p_lang^α flattens the distribution toward uniform.
    * α = 1/2 is the one exponent with an oracle-exact form: √ is IEEE
    * correctly rounded (general pow is not), and everything downstream of
    * the per-language √ stays in integer arithmetic — weight
    * s_l = floor(√n_l), target_l = targetTotal·s_l div Σs — so
    * cross-engine summation order cannot flip anything. A target above
    * n_docs means the language is repeated (upsampled) — standard for
    * low-resource languages, reported rather than capped.
    *
    * Scale shape: one count aggregation to #languages rows; the Σs window
    * is over those few rows (documented tiny-frame exception to the
    * no-unpartitioned-window rule). */
  def temperatureMix(docs: DataFrame, targetTotal: Long): DataFrame = {
    require(targetTotal > 0, s"temperatureMix needs a positive target, got $targetTotal")
    docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
      .withColumn("target_docs",
        expr(s"($targetTotal * weight) div sum(weight) over ()"))
      .select(col("lang"), col("n_docs"), col("weight"), col("target_docs"))
  }

  // ------------------------------------------------------------- registry

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_distinct_kmv" -> ((s, dir) => Util.orderAll(kmvDistinct(docs(s, dir)))),
    "doc_feature_hash" -> ((s, dir) => Util.orderAll(featureHashEmbed(docs(s, dir)))),
    "doc_temperature_mix" -> ((s, dir) => Util.orderAll(temperatureMix(docs(s, dir), 10000L))),
  )

  def oracle: Map[String, String] = Map(
    // vocab = dense_rank over ALL distinct tokens (the Dedup convention);
    // distinct (lang, token) before hashing; distinct hashes per lang;
    // k-smallest via row_number; integer estimator
    "doc_distinct_kmv" -> (
      s"""WITH tok AS (
         |  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
         |), vocab AS (
         |  SELECT token, dense_rank() OVER (ORDER BY token) AS tid
         |  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents) t
         |), h AS (
         |  SELECT DISTINCT lang, ((tid % 3037000493) * 2654435761) % $KmvSpace AS h
         |  FROM (SELECT DISTINCT lang, token FROM tok) lt JOIN vocab USING (token)
         |), rk AS (
         |  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rk FROM h
         |), agg AS (
         |  SELECT lang, count(*) AS n_kept, max(h) AS hk
         |  FROM rk WHERE rk <= 64 GROUP BY lang
         |)
         |""".stripMargin + Util.wrap(
        s"""SELECT lang, n_kept,
           |  CASE WHEN n_kept < 64 THEN n_kept ELSE (63 * $KmvSpace) // hk END AS est_distinct
           |FROM agg""".stripMargin,
        Seq("lang", "n_kept", "est_distinct"))),

    // CASTs pin DuckDB's HUGEINT sum to BIGINT (Spark sum-of-long)
    "doc_feature_hash" -> Util.wrap(
      """SELECT doc_id, hb % 16 AS dim,
        |  CAST(sum(CASE WHEN (hb // 16) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS weight
        |FROM (
        |  SELECT doc_id, ((tid % 3037000493) * 2654435761) // 65536 AS hb
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) o
        |  JOIN (
        |    SELECT token, dense_rank() OVER (ORDER BY token) AS tid
        |    FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents) t
        |  ) vocab USING (token)
        |) q GROUP BY doc_id, hb % 16""".stripMargin,
      Seq("doc_id", "dim", "weight")),

    "doc_temperature_mix" -> Util.wrap(
      """SELECT lang, n_docs, weight,
        |  (10000 * weight) // CAST(sum(weight) OVER () AS BIGINT) AS target_docs
        |FROM (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS weight
        |  FROM documents GROUP BY lang
        |) c""".stripMargin,
      Seq("lang", "n_docs", "weight", "target_docs")),
  )
}
