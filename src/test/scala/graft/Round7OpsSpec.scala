package graft

import graft.llm.{Dedup, TextAnalysis}
import graft.operators.Skyline
import org.apache.spark.sql.functions._

/** Specs for the round-7 additions: the two-phase window skyline, the
  * deterministic shard shuffle, and sorted-neighborhood dedup. Each is
  * checked against a brute-force definition on constructed data (the fixture
  * oracle parity is the driver's DuckDB gate; these pin the semantics the
  * oracle can't isolate — partition invariance, tie handling, blind spots).
  */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("skyline: equals the quadratic NOT EXISTS definition, ties kept, partition-invariant") {
    val pts = Seq(
      (1L, 10L, 5.0), (2L, 10L, 5.0),  // duplicate frontier point: BOTH kept
      (3L, 10L, 4.0),                  // dominated by 1/2 (same x, smaller y)
      (4L, 8L, 9.0),                   // frontier
      (5L, 8L, 9.0),                   // its duplicate
      (6L, 12L, 1.0),                  // frontier (max x)
      (7L, 7L, 8.0),                   // dominated by 4 (both strictly)
      (8L, 12L, 0.5),                  // dominated by 6 (same x, smaller y)
      (9L, 1L, 20.0)                   // frontier (max y)
    ).toDF("id", "x", "y")

    val brute = {
      val a = pts.as("t")
      val dominated = a.join(pts.as("u"),
          $"u.x" >= $"t.x" && $"u.y" >= $"t.y" &&
            ($"u.x" > $"t.x" || $"u.y" > $"t.y"), "left_semi")
        .select($"t.id").as[Long].collect().toSet
      pts.filter(!col("id").isin(dominated.toSeq: _*))
        .select("id").as[Long].collect().toSet
    }
    val sky = Skyline(pts, "x", "y").select("id").as[Long].collect().toSet
    assert(sky == brute)
    assert(sky == Set(1L, 2L, 4L, 5L, 6L, 9L))

    // phase-1 pruning must lose nothing whatever the partitioning: an
    // adversarial layout that co-locates each frontier point with its
    // dominator still yields the exact global skyline
    val skewed = Skyline(pts.repartition(7, col("y")), "x", "y")
      .select("id").as[Long].collect().toSet
    assert(skewed == brute)

    // the custom SkylineExec and the typed-Dataset twin agree row-for-row
    val viaDs = Skyline.viaDataset(pts.repartition(5), "x", "y")
      .select("id").as[Long].collect().toSet
    assert(viaDs == brute, "Dataset twin diverged from the physical operator")
    // and the plan actually used the custom node
    val plan = Skyline(pts, "x", "y").queryExecution.executedPlan.toString
    assert(plan.contains("Skyline"), s"custom exec not planned:\n$plan")
  }

  test("shuffleShards: a reproducible permutation — partition-invariant, dense pos per shard") {
    val docs = (1L to 500L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val a = TextAnalysis.shuffleShards(docs, 16)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = TextAnalysis.shuffleShards(docs.repartition(13), 16)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // same (shard, pos) for every doc regardless of input partitioning
    assert(a.sameElements(b))
    // every doc appears exactly once; within a shard, pos is 1..n dense
    assert(a.map(_._1).distinct.length == 500)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    // the mix actually permutes: doc order within a shard is not id order
    val shard0 = a.filter(_._2 == a.head._2).sortBy(_._3).map(_._1)
    assert(!shard0.sameElements(shard0.sorted))
  }

  test("snm: key-adjacent boilerplate variants pair; far texts and cross-block pairs do not") {
    val docs = Seq(
      // same text modulo injected digits/punct → identical sort key → adjacent
      (1L, "alpha beta gamma delta session 1234"),
      (2L, "alpha beta gamma delta session 9876!"),
      (3L, "alpha beta gamma delta session 555"),
      // same 4-char block prefix, but > maxDist edits away
      (4L, "alphX completely different content that is nowhere near the others"),
      // different block: never compared against 1-3 even if similar length
      (5L, "zeta eta theta iota session 1234")
    ).toDF("doc_id", "text")

    val pairs = Dedup.snmPairs(docs, window = 3, maxDist = 20)
      .as[(Long, Long, Long)].collect().toSet
    val found = pairs.map(p => (p._1, p._2))
    assert(found == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"expected exactly the variant triangle, got $found")
    // distances are the true Levenshtein distances (bounded DP must not clip)
    pairs.foreach { case (_, _, d) => assert(d > 0 && d <= 20) }
    // orientation: doc_a < doc_b always
    pairs.foreach { case (a2, b2, _) => assert(a2 < b2) }
  }

  test("snm multi-pass: reversed-key pass recovers the forward-block blind spot") {
    // edits concentrated in the FIRST 4 chars: forward blocks differ
    // ("alph" vs "bravo"...), so the single pass is blind; the reversed key
    // sorts them adjacently (shared suffix) and the pair verifies at dist 5
    val docs = Seq(
      (1L, "alpha common tail of the document body"),
      (2L, "bravo common tail of the document body"),
      // unrelated doc in between either ordering
      (3L, "zzz totally different text with nothing shared at all")
    ).toDF("doc_id", "text")
    val single = Dedup.snmPairs(docs, 3, 20)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val multi = Dedup.snmPairsMultiPass(docs, 3, 20)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!single.contains((1L, 2L)), "forward pass must be blind to a leading-edit pair")
    assert(multi.contains((1L, 2L)), s"reversed pass must recover it: $multi")
    // union semantics: multi is a superset of single, pairs stay oriented
    assert(single.subsetOf(multi))
  }

  test("embDecontaminate: threshold gate + best witness, eval rows never flagged") {
    import graft.llm.Similarity
    // 3 eval vectors (ids 0, 4, 8 under mod 4); train vectors aligned with
    // exactly one of them or orthogonal to all
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),   // eval
      (4L, Array(0f, 1f, 0f, 0f)),   // eval
      (8L, Array(0f, 0f, 1f, 0f)),   // eval
      (1L, Array(10f, 1f, 0f, 0f)),  // ~eval 0 (cos .995) and weakly eval 4
      (2L, Array(0f, 2f, 2f, 0f)),   // cos .707 vs BOTH 4 and 8 → witness = 4 (lower id)
      (3L, Array(0f, 0f, 0f, 5f))    // orthogonal to all: clean
    ).toDF("vec_id", "embedding")
    val out = Similarity.embDecontaminate(vecs, 4, 0.5)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSet == Set(1L, 2L), s"flagged set wrong: ${out.toSeq}")
    val w1 = out.find(_._1 == 1L).get
    assert(w1._2 == 0L && w1._3 > 0.99, s"vec 1 witness: $w1")
    val w2 = out.find(_._1 == 2L).get
    assert(w2._2 == 4L, s"tie on cosine must pick the lower eval_id: $w2")
  }

  test("skyline: NaN rows are excluded and can't mask dominators; -0.0 can't leak a dominated row") {
    val pts = Seq(
      (1L, 10L, 7.0),
      (2L, 5L, Double.NaN), // excluded — NaN admitted would mask row 1
      (3L, 3L, 6.0),        // dominated by row 1, must NOT survive
      (4L, 5L, -0.0),       // signed zero...
      (5L, 5L, 0.0),        // ...tie with +0.0: equal point, both dominated by 1
      (6L, 1L, 9.0)         // frontier (max y)
    ).toDF("id", "x", "y")
    val sky = Skyline(pts, "x", "y").select("id").as[Long].collect().toSet
    assert(sky == Set(1L, 6L), s"got $sky")
    // -0.0 eviction desync regression: a zero-y frontier point with both
    // signs, then a dominator — nothing with y <= dominator's y survives
    val z = Seq((1L, 5L, -0.0), (2L, 5L, 0.0), (3L, 6L, 1.0)).toDF("id", "x", "y")
    val zs = Skyline(z, "x", "y").select("id").as[Long].collect().toSet
    assert(zs == Set(3L), s"signed-zero desync leaked a dominated row: $zs")
  }

  test("groupSplit: empty-string and NULL sources still get assigned (no silent drops)") {
    val docs = Seq(
      (1L, "t", "siteA"), (2L, "t", "siteA"),
      (3L, "t", ""),                      // empty group key
      (4L, "t", null.asInstanceOf[String]) // NULL group key
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.groupSplit(docs)
      .as[(Option[String], String, Long)].collect()
    assert(out.map(_._3).sum == 4L, s"counts must re-add to the corpus: ${out.toSeq}")
    assert(out.exists(_._1.contains("")), "empty source vanished")
    assert(out.exists(_._1.isEmpty), "NULL source vanished")
  }

  test("groupSplit: one split per source (integrity), all splits materialize on enough groups") {
    val docs = (1L to 400L).map(i => (i, s"text $i", s"site${i % 80}"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.groupSplit(docs)
      .as[(String, String, Long)].collect()
    // the leakage invariant: no source straddles two splits
    assert(out.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 1),
      s"a source landed in two splits: ${out.toSeq}")
    // counts re-add to the corpus
    assert(out.map(_._3).sum == 400L)
    // with 80 groups all three splits should be populated (mix quality)
    assert(out.map(_._2).distinct.length == 3, s"splits seen: ${out.map(_._2).distinct.toSeq}")
  }

  test("phash: identical payloads at distance 0; a light edit stays <= 3; noise doesn't pair") {
    import graft.llm.Multimodal
    val base = ('a' to 'z').mkString(" ") * 3 // 153 chars, >= 64
    val docs = Seq(
      (1L, base),
      (2L, base),                       // exact copy → hamming 0
      (3L, base.replace("a b c", "a e c")), // one-cell nudge → small distance
      (4L, "z y x w v u t s r q p o n m l k j i h g f e d c b a " * 4)
    ).toDF("doc_id", "text")
    val pairs = Multimodal.phashPairs(docs, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L),
      s"exact copy must pair at distance 0: $pairs")
    assert(pairs.exists(p => (p._1, p._2) == (1L, 3L)),
      s"light edit must stay within the bound: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"reversed-alphabet noise must not pair: $pairs")
    // bands are 16-bit values — the no-signed-overflow invariant
    val bands = Multimodal.phashBands(docs)
      .as[(Long, Long, Long)].collect()
    assert(bands.forall(b => b._3 >= 0 && b._3 < 65536))
    assert(bands.groupBy(_._1).forall(_._2.length == 4), "4 bands per doc")
  }

  test("snm window bound: a variant more than `window` ranks away is the documented miss") {
    // 5 identical-key docs: rank window 2 pairs (r, r+1), (r, r+2) only —
    // (1,4), (1,5), (2,5) are out of window and MUST be absent (that is the
    // SNM tradeoff the multi-pass note in the scaladoc answers)
    val docs = (1L to 5L).map(i => (i, s"same key text $i"))
      .toDF("doc_id", "text")
    val pairs = Dedup.snmPairs(docs, window = 2, maxDist = 20)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
      (3L, 4L), (3L, 5L), (4L, 5L)))
  }
}
