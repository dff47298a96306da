package graft.llm

import graft.{Tables, Util}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL-based corpus curation — the C4/RefinedWeb-style gate that runs BEFORE
  * any text is read: parse → normalize → dedup-by-URL → registrable-domain
  * stats → blocklist routing. Web-crawl pipelines drop 30–50 % of candidate
  * pages on URL evidence alone (duplicate fetches of the same resource under
  * tracking-parameter / case / trailing-slash variants, blocklisted domains,
  * boilerplate paths), so this family is the cheapest filter in the whole
  * chain: pure string expressions, zero joins against anything document-sized.
  *
  * The fixture documents carry no URL column, so [[urlSqlExpr]] synthesizes a
  * deterministic URL per document — same convention as
  * [[Multimodal.mediaTable]]'s synthetic payloads. The expression is ONE SQL
  * string evaluated by BOTH engines (Spark `expr(...)` and the DuckDB oracle
  * splice), so the synthesis can never drift between the two sides. It
  * exercises every normalization hazard on purpose: mixed-case hosts,
  * optional `www.`/`blog.` subdomains, multi-label public suffixes
  * (`co.uk`), tracking parameters in first/middle/only position, trailing
  * slashes, and fragments — with the modulus grid tuned so the hazards
  * MERGE under normalization (~10 % of URLs at sf0.01 are fetch-equivalent
  * variants of another doc's URL), so `url_dedup` is verified on groups it
  * actually collapses, not on a corpus where every group has size 1.
  *
  * Scale notes (100 TB): parse/normalize are codegen'd `regexp_extract` /
  * `regexp_replace` projections — narrow, no shuffle, whole-stage fused with
  * the scan. `url_normalize`'s dedup groups on the normalized URL (the ONLY
  * document-cardinality shuffle in the family, and it ships two small
  * columns, never text). Domain stats group on registrable domain —
  * web-graph domain counts are power-law-skewed, which is exactly the
  * partial-aggregation shape: map-side combine collapses each mapper's hot
  * domain to one row before the exchange, so the reducer for `cnn.com`
  * receives #mappers rows, not #pages. The blocklist is a broadcast join
  * (real blocklists are 10⁴–10⁶ domains — megabytes), never a shuffle.
  */
object UrlCuration {

  /** Host synthesis sub-expression (shared by [[urlSqlExpr]]'s cased and
    * uncased branches): optional subdomain + source + public suffix. */
  private val hostSql =
    "concat(CASE doc_id % 3 WHEN 0 THEN 'www.' WHEN 1 THEN '' ELSE 'blog.' END, " +
      "source, '.', " +
      "CASE doc_id % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'org' WHEN 2 THEN 'co.uk' " +
      "WHEN 3 THEN 'io' ELSE 'net' END)"

  /** Deterministic per-document URL, valid in BOTH Spark SQL and DuckDB —
    * the single source of truth for the synthetic url column. */
  val urlSqlExpr: String =
    "concat(" +
      "CASE WHEN doc_id % 7 = 0 THEN 'http' ELSE 'https' END, '://', " +
      s"CASE WHEN doc_id % 11 = 0 THEN upper($hostSql) ELSE $hostSql END, " +
      "concat('/p/page-', CAST(doc_id % 13 AS STRING), " +
      "  CASE WHEN doc_id % 9 = 0 THEN '/' ELSE '' END), " +
      "CASE doc_id % 4 " +
      "  WHEN 0 THEN concat('?utm_source=feed&id=', CAST(doc_id % 10 AS STRING)) " +
      "  WHEN 1 THEN concat('?id=', CAST(doc_id % 10 AS STRING)) " +
      "  WHEN 2 THEN '?utm_campaign=spring&utm_medium=email' ELSE '' END, " +
      "CASE WHEN doc_id % 6 = 0 THEN concat('#sec', CAST(doc_id % 4 AS STRING)) ELSE '' END)"

  /** RFC-3986-lite component split. Both engines return '' for an optional
    * group that did not participate in the match (verified empirically), so
    * absent query/fragment come back as empty string, not NULL. */
  val urlRe = "^([a-z]+)://([^/?#]+)([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Registrable domain over the LOWERCASED host: last two labels, or last
    * three when the suffix is the multi-label `co.uk`. Leftmost-first
    * alternation anchored at `$` — Java regex and RE2 agree (verified). A
    * production build would swap the alternation for the full public-suffix
    * list; the rule shape (longest matching suffix + one label) is the same. */
  val regDomainRe = "([^.]+\\.co\\.uk|[^.]+\\.[^.]+)$"

  /** documents + synthetic url column. */
  def urlTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("lang"), expr(urlSqlExpr).as("url"))

  /** Components + registrable domain + provenance (`source`) — one
    * codegen'd projection over [[urlTable]]. [[parsed]] drops `source` for
    * the schema-pinned `url_parse` view; [[blocklistAudit]] keeps it so no
    * second urlTable scan + join is needed to recover provenance. */
  private def parsedWithSource(docs: DataFrame): DataFrame =
    urlTable(docs).select(
      col("doc_id"), col("source"), col("url"),
      regexp_extract(col("url"), urlRe, 1).as("scheme"),
      regexp_extract(col("url"), urlRe, 2).as("host"),
      regexp_extract(col("url"), urlRe, 3).as("path"),
      regexp_extract(col("url"), urlRe, 4).as("qs"),
      regexp_extract(col("url"), urlRe, 5).as("fragment"))
      .withColumn("reg_domain",
        regexp_extract(lower(col("host")), regDomainRe, 1))

  /** Parse into components + registrable domain — one codegen'd projection. */
  def parsed(docs: DataFrame): DataFrame =
    parsedWithSource(docs).drop("source")

  /** Canonical URL: lowercase host, strip `www.`, drop tracking params and
    * fragment, trim trailing slash. Two-step utm removal keeps the remaining
    * query well-formed: first kill `utm_x=v&` pairs (separator AFTER), then
    * any still-attached `[?&]utm_x=v` tail (separator BEFORE). */
  def normalized(docs: DataFrame): DataFrame = {
    val p = parsed(docs)
    val q1 = regexp_replace(col("qs"), "utm_[a-z]+=[^&#]*&", "")
    val q2 = regexp_replace(q1, "[?&]utm_[a-z]+=[^&#]*", "")
    p.withColumn("norm_url",
      concat(col("scheme"), lit("://"),
        regexp_replace(lower(col("host")), "^www\\.", ""),
        rtrim(col("path"), "/"), q2))
  }

  /** URL-level dedup: group fetch-equivalent variants, keep min doc_id. */
  def urlDedup(docs: DataFrame): DataFrame =
    normalized(docs)
      .groupBy(col("norm_url"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_variants"),
        min(col("doc_id")).as("keeper"))

  /** Per-registrable-domain corpus stats (the domain-cap / provenance view). */
  def domainStats(docs: DataFrame): DataFrame =
    parsed(docs)
      .groupBy(col("reg_domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(lower(col("host"))).as("n_hosts"),
        sum(when(col("scheme") === "https", 1L).otherwise(0L)).as("n_https"))

  /** Blocked registrable domains — broadcast-joined, never shuffled. The
    * fixture's tld is correlated with the source (doc_id ≡ N (mod 20) pins
    * doc_id mod 5), so each source owns exactly one registrable domain;
    * these three exist by that arithmetic (7→co.uk, 3→io, 11→org). */
  val blockedDomains: Seq[String] = Seq("src7.co.uk", "src3.io", "src11.org")

  /** Blocklist routing: domain block wins over path block; per-source
    * admission counts. The domain list goes through an explicit broadcast
    * join (the 100 TB shape — real lists are 10⁴–10⁶ rows, megabytes) rather
    * than an `isin` literal, so the same plan holds when the list lives in a
    * table. */
  def blocklistAudit(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bl = blockedDomains.toDF("bad_domain")
    val p = parsedWithSource(docs)
      .join(broadcast(bl), col("reg_domain") === col("bad_domain"), "left")
    val domBlocked = col("bad_domain").isNotNull
    val pathBlocked = !domBlocked &&
      (col("path").endsWith("/page-7") || col("path").endsWith("/page-7/"))
    p.groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(domBlocked, 1L).otherwise(0L)).as("n_dom_blocked"),
        sum(when(pathBlocked, 1L).otherwise(0L)).as("n_path_blocked"),
        sum(when(!domBlocked && !pathBlocked, 1L).otherwise(0L)).as("n_kept"))
  }

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "url_parse" -> ((s, dir) => Util.orderAll(parsed(docs(s, dir)))),
    "url_dedup" -> ((s, dir) => Util.orderAll(urlDedup(docs(s, dir)))),
    "url_domain_stats" -> ((s, dir) => Util.orderAll(domainStats(docs(s, dir)))),
    "url_blocklist" -> ((s, dir) => Util.orderAll(blocklistAudit(docs(s, dir)))))

  /** Shared oracle CTE: synthesis + parse, from the SAME [[urlSqlExpr]] /
    * [[urlRe]] strings the Spark side evaluates. */
  private val urlCte: String =
    s"""WITH u AS (
       |  SELECT doc_id, source, lang, $urlSqlExpr AS url FROM documents
       |), p AS (
       |  SELECT doc_id, source, url,
       |    regexp_extract(url, '$urlRe', 1) AS scheme,
       |    regexp_extract(url, '$urlRe', 2) AS host,
       |    regexp_extract(url, '$urlRe', 3) AS path,
       |    regexp_extract(url, '$urlRe', 4) AS qs,
       |    regexp_extract(url, '$urlRe', 5) AS fragment,
       |    regexp_extract(lower(regexp_extract(url, '$urlRe', 2)), '$regDomainRe', 1) AS reg_domain
       |  FROM u
       |)
       |""".stripMargin

  private val normCte: String =
    """, n AS (
      |  SELECT doc_id, url,
      |    concat(scheme, '://',
      |      regexp_replace(lower(host), '^www\.', '', 'g'),
      |      rtrim(path, '/'),
      |      regexp_replace(regexp_replace(qs, 'utm_[a-z]+=[^&#]*&', '', 'g'),
      |                     '[?&]utm_[a-z]+=[^&#]*', '', 'g')) AS norm_url
      |  FROM p
      |)
      |""".stripMargin

  def oracle: Map[String, String] = Map(
    "url_parse" -> (urlCte + Util.wrap(
      "SELECT doc_id, url, scheme, host, path, qs, fragment, reg_domain FROM p",
      Seq("doc_id"))),

    "url_dedup" -> (urlCte + normCte + Util.wrap(
      """SELECT norm_url, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
        |  min(doc_id) AS keeper
        |FROM n GROUP BY norm_url""".stripMargin,
      Seq("norm_url"))),

    "url_domain_stats" -> (urlCte + Util.wrap(
      """SELECT reg_domain, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT lower(host)) AS BIGINT) AS n_hosts,
        |  CAST(sum(CASE WHEN scheme = 'https' THEN 1 ELSE 0 END) AS BIGINT) AS n_https
        |FROM p GROUP BY reg_domain""".stripMargin,
      Seq("reg_domain"))),

    "url_blocklist" -> (urlCte +
      s""", bl AS (
         |  SELECT unnest(['${blockedDomains.mkString("', '")}']) AS bad_domain
         |), r AS (
         |  SELECT p.source,
         |    (bad_domain IS NOT NULL) AS dom_b,
         |    (bad_domain IS NULL AND
         |     (path LIKE '%/page-7' OR path LIKE '%/page-7/')) AS path_b
         |  FROM p LEFT JOIN bl ON p.reg_domain = bl.bad_domain
         |)
         |""".stripMargin + Util.wrap(
      """SELECT source, CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN dom_b THEN 1 ELSE 0 END) AS BIGINT) AS n_dom_blocked,
        |  CAST(sum(CASE WHEN path_b THEN 1 ELSE 0 END) AS BIGINT) AS n_path_blocked,
        |  CAST(sum(CASE WHEN NOT dom_b AND NOT path_b THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM r GROUP BY source""".stripMargin,
      Seq("source"))))
}
