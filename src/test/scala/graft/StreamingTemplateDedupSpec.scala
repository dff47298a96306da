package graft

import graft.llm.PrefData
import graft.streaming.StreamingTemplateDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Native streaming aggregation twin of templateDedup: the running report
  * after all input equals the batch operator (source spread via HLL —
  * exact on the fixture's small per-template source sets, asserted). */
class StreamingTemplateDedupSpec extends SparkSpec {
  import spark.implicits._

  test("running template report == batch templateDedup after each micro-batch's prefix") {
    val docs = Tables.table(spark, sf, "documents")
    val rows = docs.select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    val half = rows.length / 2
    val mem = MemoryStream[(Long, String, String)](spark)
    val q = StreamingTemplateDedup.templateCounts(
        mem.toDF().toDF("doc_id", "source", "text"))
      .writeStream.format("memory").queryName("tmpl_sink")
      .outputMode("complete").start()
    try {
      def snapshot(): Map[String, (Long, Long, Long)] =
        spark.table("tmpl_sink").filter(col("n_docs") > 1)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      def batchOf(prefix: Seq[(Long, String, String)]): Map[String, (Long, Long, Long)] =
        PrefData.templateDedup(prefix.toDF("doc_id", "source", "text")
          .withColumn("text", col("text")))
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

      mem.addData(rows.take(half): _*)
      q.processAllAvailable()
      assert(snapshot() == batchOf(rows.take(half)),
        "prefix report != batch templateDedup on the same prefix")

      mem.addData(rows.drop(half): _*)
      q.processAllAvailable()
      val full = snapshot()
      assert(full == batchOf(rows), "full report != batch templateDedup")
      assert(full.nonEmpty, "degenerate fixture: no template collapse")
    } finally q.stop()
  }
}
