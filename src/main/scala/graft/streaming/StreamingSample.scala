package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.llm.TextAnalysis.sampleExact]]: a running
  * exact-N-per-language document sample over a stream.
  *
  * Deterministic uniform sampling IS bottom-k ordering under a fixed hash
  * — which makes it exactly mergeable the same way KMV is (the bottom-k of
  * a union is the bottom-k of the two bottom-k sets), so the streaming
  * fold (keep the k hash-smallest docs seen so far per language) produces,
  * after ANY stream prefix, bit-for-bit the batch [[graft.llm.TextAnalysis.sampleExact]]
  * of that prefix — the spec asserts it mid-stream, not just at the end.
  * The SAME multiplicative hash as the batch operator (a shared ordering
  * contract, not a convention): any other hash would sample a different,
  * equally-uniform subset and silently break the prefix-parity guarantee
  * eval-set construction relies on.
  *
  * State is BOUNDED at `perStratum` (hash, doc_id) pairs per language by
  * construction. Each trigger re-emits the touched languages' full current
  * sample (≤ k rows each, Update mode) — latest-per-language downstream IS
  * the sample, no tombstones needed for docs that fell out of the bottom-k.
  */
object StreamingSample {

  /** (lang, doc_id, rk) — the current per-language sample after each
    * trigger; `docs` needs (lang, doc_id). */
  def run(docs: DataFrame, perStratum: Int): DataFrame = {
    require(perStratum >= 1,
      s"StreamingSample: perStratum must be >= 1, got $perStratum")
    val session = docs.sparkSession
    import session.implicits._
    val keyed = docs
      .select(col("lang"), col("doc_id"),
        expr("((doc_id % 3037000493) * 2971215073) div 65536").as("h"))
      .as[(String, Long, Long)]
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState[Array[(Long, Long)], (String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (lang: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[Array[(Long, Long)]]) =>
          val prev = state.getOption.getOrElse(Array.empty[(Long, Long)])
          val merged = (prev ++ rows.map(r => (r._3, r._2))).distinct
            .sorted.take(perStratum)
          state.update(merged)
          merged.iterator.zipWithIndex.map { case ((_, id), i) =>
            (lang, id, (i + 1).toLong)
          }
      }
      .toDF("lang", "doc_id", "rk")
  }
}
