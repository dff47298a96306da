package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One document entering the packer. */
case class PackIn(doc_id: Long, source: String, n_tokens: Int)

/** The packing decision for one document. */
case class PackOut(doc_id: Long, source: String, n_tokens: Int,
                   pack_id: Long, pack_offset: Long)

/** Streaming twin of [[graft.llm.TextAnalysis.packGreedy]]: concat-and-cut
  * sequence packing over a document STREAM. The batch operator's running
  * token count becomes explicit keyed state — one Long (the shard's
  * cumulative token count) per `source`, carried across micro-batches by
  * `flatMapGroupsWithState`. State is O(#sources) regardless of stream
  * length, and never needs a timeout: a shard's cursor is exactly what a
  * resumed ingestion job must remember.
  *
  * Ordering contract: packing is order-dependent by nature. Within a
  * micro-batch rows are packed in doc_id order (deterministic given batch
  * contents); ACROSS batches the order is arrival order — the same batch →
  * stream semantic shift as [[graft.llm.TextAnalysis.streamingCurate]]'s
  * keeper election (min-doc_id → first-arrival). When documents arrive in
  * doc_id order, the stream reproduces the batch packing bit-for-bit
  * (asserted in StreamingSpec).
  *
  * Operational bounds the caller owns:
  *  - `source` must be a BOUNDED-cardinality shard key (crawl partition,
  *    dataset name) — never per-host/per-URL. State has no TTL by design
  *    (evicting a cursor and restarting at 0 would REUSE pack ids of a
  *    shard's earlier documents — silent collisions are worse than state
  *    growth), so unbounded shard cardinality grows the state store and
  *    checkpoint monotonically.
  *  - The per-(source, micro-batch) group is buffered on one task's heap
  *    for the in-batch sort; bound trigger size (maxOffsetsPerTrigger /
  *    maxFilesPerTrigger) during catch-up replays so a hot shard's batch
  *    slice fits an executor.
  */
object StreamingPack {

  private def fold(budget: Int)(source: String, rows: Iterator[PackIn],
                                state: GroupState[Long]): Iterator[PackOut] = {
    var cum = state.getOption.getOrElse(0L)
    val out = rows.toIndexedSeq.sortBy(_.doc_id).map { r =>
      val start = cum
      cum += r.n_tokens
      PackOut(r.doc_id, source, r.n_tokens, start / budget, start % budget)
    }
    state.update(cum)
    out.iterator
  }

  /** Apply to a streaming frame with (doc_id, text, source) columns. Output
    * mode of the enclosing query: Append. */
  def apply(docStream: DataFrame, budget: Int): Dataset[PackOut] = {
    require(budget >= 1, s"StreamingPack: budget must be >= 1, got $budget")
    val spark = docStream.sparkSession
    import spark.implicits._
    docStream
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tokens"))
      .as[PackIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(
        fold(budget))
  }
}
