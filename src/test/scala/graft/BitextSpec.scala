package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Bitext mining (margin-based parallel-pair alignment): laws the DuckDB
  * parity oracle can't isolate — the ≥1.0 mutual-best margin bound, the
  * hubness suppression the margin exists for, threshold non-vacuity on the
  * fixture, and the coarse-cell containment of the LSH variant. */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.table(spark, sf, "embeddings")

  test("bitext: every mutual-best pair has margin >= 1.0 (construction law), sides have correct parity") {
    val m = Similarity.bitextMine(emb, 4, 0L)
    assert(m.count() > 0, "fixture must yield mutual-best pairs")
    assert(m.filter(col("margin_ppm") < 1000000L).count() == 0L,
      "a mutual-best pair's cosine is the max of both top-4 sets, so 2ck/(sa+sb) >= 1")
    assert(m.filter(col("src_id") % 2 =!= 0 || col("tgt_id") % 2 =!= 1).count() == 0L)
  }

  test("bitext: the fixture margin gate discriminates — drops some mutual-best pairs, keeps some") {
    val all = Similarity.bitextMine(emb, 4, 0L).count()
    val kept = Similarity.bitextMine(emb, 4, Similarity.BitextMinPpm).count()
    assert(kept > 0, "gate must keep at least one pair (else the query is vacuous)")
    assert(kept < all, s"gate must drop at least one pair (all=$all kept=$kept)")
  }

  test("bitext: a boilerplate hub cluster is suppressed; an isolated near-identical pair survives") {
    // The failure mode the margin exists for: a dense cluster (evens {2,4},
    // odds {3,5,7} all near-identical — boilerplate embeddings) where every
    // cross pair's cosine ~= its neighborhood average, so margin ~= 1.0 and
    // the gate drops it; vs the isolated true pair (0,1) whose cosine
    // towers over both near-zero neighborhoods -> margin ~= 2.0. A raw
    // cosine threshold CANNOT make this call: the cluster cosines (~0.9999)
    // are far HIGHER than the true pair's (~0.995).
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),      // src of the true pair
      (1L, Array(0.99f, 0.1f, 0f, 0f)), // tgt of the true pair
      (2L, Array(0f, 0f, 1f, 1f)),      // hub cluster, even side
      (4L, Array(0f, 0f, 1f, 0.98f)),
      (3L, Array(0f, 0f, 1f, 0.99f)),   // hub cluster, odd side
      (5L, Array(0f, 0f, 0.99f, 1f)),
      (7L, Array(0f, 0.01f, 1f, 1f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(0))
    val mined = Similarity.bitextMine(rows, 2, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    val pair01 = mined.find(p => p._1 == 0L && p._2 == 1L)
    assert(pair01.isDefined, s"the isolated near-identical pair must be mined: $mined")
    assert(pair01.get._3 > Similarity.BitextMinPpm, s"true pair margin must clear the gate: ${pair01.get}")
    val hubPairs = mined.filter(p => p._1 != 0L)
    assert(hubPairs.nonEmpty, "the cluster must produce at least one mutual-best pair")
    hubPairs.foreach { p =>
      assert(p._3 < Similarity.BitextMinPpm, s"cluster pair must stay under the gate: $p (mined=$mined)")
    }
  }

  test("bitext LSH: every mined pair shares the coarse cell; margins respect the same >= 1.0 law") {
    val cells = Similarity.lshBuckets(emb)
      .select(col("vec_id"), pmod(col("bucket"), lit(16L)).as("cell"))
    val m = Similarity.bitextMineLsh(emb, 4, 0L)
    assert(m.count() > 0, "coarse cells must yield candidates on the fixture")
    assert(m.filter(col("margin_ppm") < 1000000L).count() == 0L)
    val joined = m
      .join(cells.select(col("vec_id").as("src_id"), col("cell").as("ca")), "src_id")
      .join(cells.select(col("vec_id").as("tgt_id"), col("cell").as("cb")), "tgt_id")
    assert(joined.filter(col("ca") =!= col("cb")).count() == 0L,
      "bucketed mining must never pair across coarse cells")
  }
}
