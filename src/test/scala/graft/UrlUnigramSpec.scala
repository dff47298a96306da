package graft

import graft.llm.{Dedup, UnigramLm, UrlCuration}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Specs for the URL-curation gate, the unigram-LM Viterbi segmentation,
  * the cross-source duplication attribution, and the q7 join plan. Fixture
  * value parity is the driver's DuckDB gate; these pin the algebraic
  * invariants and plan shapes the oracle can't isolate. */
class UrlUnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.table(spark, sf, "documents")

  test("url parse: components reassemble to the original url, losslessly, for every row") {
    val bad = UrlCuration.parsed(docs)
      .withColumn("rebuilt",
        concat(col("scheme"), lit("://"), col("host"), col("path"),
          col("qs"), col("fragment")))
      .filter(col("rebuilt") =!= col("url"))
      .count()
    assert(bad == 0L, s"$bad rows failed url reassembly")
  }

  test("url normalize: output is canonical — no tracking params, fragment, www, trailing slash, or host case") {
    val n = UrlCuration.normalized(docs).select("norm_url").as[String].collect()
    assert(n.nonEmpty)
    n.foreach { u =>
      assert(!u.contains("utm_"), u)
      assert(!u.contains("#"), u)
      assert(!u.contains("://www."), u)
      assert(!u.endsWith("/"), u)
      val host = u.drop(u.indexOf("://") + 3).takeWhile(c => c != '/' && c != '?')
      assert(host == host.toLowerCase, u)
    }
  }

  test("url dedup: partitions the corpus, keeper is a group member, and real merge groups exist") {
    val d = UrlCuration.urlDedup(docs)
    val total = docs.count()
    assert(d.agg(sum("n_docs")).head().getLong(0) == total,
      "dedup groups must partition the corpus")
    assert(d.filter(col("n_docs") > 1).count() > 0,
      "fixture must contain fetch-equivalent variants (else the dedup is vacuous)")
    // every group's keeper resolves back to a doc whose normalized url is the key
    val joined = UrlCuration.normalized(docs)
      .select(col("doc_id").as("keeper"), col("norm_url"))
      .join(d, Seq("norm_url", "keeper"))
    assert(joined.count() == d.count(), "keeper must be a member of its group")
  }

  test("url domain stats + blocklist: registrable domains well-formed, routing is a disjoint cover") {
    val ds = UrlCuration.domainStats(docs)
    assert(ds.agg(sum("n_docs")).head().getLong(0) == docs.count())
    ds.select("reg_domain").as[String].collect().foreach { rd =>
      assert(rd.matches("src\\d+\\.(com|org|co\\.uk|io|net)"), rd)
    }
    val bl = UrlCuration.blocklistAudit(docs)
    val badRows = bl.filter(
      col("n_total") =!= col("n_dom_blocked") + col("n_path_blocked") + col("n_kept"))
    assert(badRows.count() == 0, "domain/path/kept must disjointly cover")
    assert(bl.agg(sum("n_dom_blocked")).head().getLong(0) > 0,
      "blocklist must actually hit (src3.co.uk et al. exist in the fixture)")
  }

  test("unigram Viterbi: matches exhaustive enumeration on every fixture word (cost AND tie-break)") {
    val pm = UnigramLm.pieceTable.toMap
    val maxLen = UnigramLm.pieceTable.map(_._1.length).max
    def enumerate(w: String): Seq[(Long, String)] =
      if (w.isEmpty) Seq((0L, ""))
      else (1 to math.min(maxLen, w.length)).flatMap { l =>
        val p = w.substring(0, l)
        pm.get(p).toSeq.flatMap { c =>
          enumerate(w.substring(l)).map { case (rc, rp) =>
            (c + rc, if (rp.isEmpty) p else p + " " + rp)
          }
        }
      }
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      val best = enumerate(w).minBy { case (c, p) => (c, p) }
      val (path, cost) = UnigramLm.segmentWord(w)
      assert((cost, path) == ((best._1, best._2)), s"word $w: DP $path/$cost vs ${best._2}/${best._1}")
      assert(path.replace(" ", "") == w, s"pieces must spell the word: $w -> $path")
      assert(path.split(" ").map(pm).sum == cost, s"cost must be the piece-cost sum: $w")
    }
  }

  test("unigram fertility: per-doc word counts match the tokenizer and fertility is the floor-div") {
    val f = UnigramLm.docFertility(docs)
    val words = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val mismatch = f.join(words, Seq("doc_id"))
      .filter(col("n_words") =!= col("n") ||
        col("fertility_micro") =!= expr("n_pieces * 1000000 div n_words"))
      .count()
    assert(mismatch == 0L)
    assert(f.count() == docs.count())
    // every word maps to >= 1 piece
    assert(f.filter(col("n_pieces") < col("n_words")).count() == 0L)
  }

  test("dup attribution: cells aggregate exactly the minhash pair set, sources ordered") {
    val pairs = Dedup.minhashLsh(docs, 0.4)
    val att = Dedup.dupAttribution(docs, 0.4)
    assert(att.agg(sum("n_pairs")).head().getLong(0) == pairs.count(),
      "attribution cells must partition the verified pair set")
    assert(att.filter(col("source_a") > col("source_b")).count() == 0L,
      "source pair must be normalized (a <= b)")
    val bad = att.filter(col("n_docs") > col("n_pairs") * 2 || col("n_docs") < 2)
    assert(bad.count() == 0L, "2 <= n_docs <= 2*n_pairs per cell")
  }

  test("q7 plan: three broadcast dims + nations, single shuffled join for lineitem x orders") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledJoin}
    val df = relational.RelQueries.queries("q7_volume_shipping")(spark, sf)
    def joins(p: SparkPlan): (Int, Int) = {
      val b = p.collect {
        case a: AdaptiveSparkPlanExec => joins(a.initialPlan)._1
        case _: BroadcastHashJoinExec => 1
      }.sum
      val s = p.collect {
        case a: AdaptiveSparkPlanExec => joins(a.initialPlan)._2
        case j: ShuffledJoin => 1
      }.sum
      (b, s)
    }
    val (b, s) = joins(df.queryExecution.executedPlan)
    // supplier/customer/nation x2 are HINTED broadcasts — always hash-side.
    // lineitem x orders is size-gated, NOT hinted: at fixture scale orders
    // fits the threshold and Catalyst broadcasts it too (b=5, s=0); at
    // production scale it outgrows the bound and falls back to a shuffled
    // join on the order key (b=4, s=1). Either way the fact table never
    // shuffles for a dimension.
    assert(b >= 4, s"the 4 hinted dims must be broadcast joins, got $b")
    assert(b + s == 5, s"expected 5 joins total, got broadcast=$b shuffled=$s")
  }
}
