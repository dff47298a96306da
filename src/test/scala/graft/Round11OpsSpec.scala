package graft

import graft.llm.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** Specs for the round-11 work: the measured stored IVF-PQ serving
  * contract (derived refine), the appendable ANN index, the empty-seed
  * dedup artifact bootstrap, and training-shard materialization. Fixture
  * oracle parity stays the driver's DuckDB gate; these pin the contracts
  * the oracle can't isolate. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("empty-seed hashed artifact: build from zero docs, first append bootstraps to == rebuild") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    val empty = docs.filter(lit(false))
    val p = java.nio.file.Files.createTempDirectory("graft-dedup-empty").toString
    Dedup.writeDedupArtifactHashed(empty, p, 0.3)
    // the ad-hoc append derives its batch id from the stored nodes part —
    // on an empty seed that read must bootstrap, not fail schema inference
    Dedup.appendDedupArtifact(docs, p)
    val p2 = java.nio.file.Files.createTempDirectory("graft-dedup-empty-reb").toString
    Dedup.writeDedupArtifactHashed(docs, p2, 0.3)
    def rows(path: String, part: String) =
      spark.read.parquet(s"$path/$part").drop("ingest_batch")
        .collect().map(_.toString).sorted.toSeq
    for (part <- Seq("pairs", "clusters", "counts", "nodes"))
      assert(rows(p, part) == rows(p2, part),
        s"empty-seed append != rebuild on $part")
    assert(spark.read.parquet(s"$p/pairs").count() > 0, "law vacuous")
  }
}
