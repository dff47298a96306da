package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming instruction-template collapse — the unbounded-feed twin of
  * [[graft.llm.PrefData.templateDedup]]: as documents arrive, maintain the
  * running per-template coverage (n_docs, exemplar = min doc_id, source
  * spread). This one needs NO custom state code at all: it is exactly the
  * shape Spark's native streaming aggregation state store exists for
  * (running counts/min keyed by the group), so the operator declares the
  * same groupBy the batch twin uses and lets the engine keep state — the
  * "let Catalyst/StateStore do it" rung, in deliberate contrast to the
  * flatMapGroupsWithState twins that genuinely need custom state shapes.
  *
  * countDistinct is not supported over streaming state, so the source
  * spread uses `approx_count_distinct` (HLL state, fixed-size per group) —
  * the documented batch↔stream delta, asserted in the spec (exact on the
  * fixture's tiny per-template source sets, approximate in general).
  *
  * Output mode: Complete for a memory-table report (template counts are a
  * running report, not an append stream); at scale the same aggregation
  * runs in Update mode into an idempotent upsert sink. The `n_docs > 1`
  * dedup gate is applied by the READER of the report, not inside the
  * stream (a row can cross the threshold as data arrives — filtering
  * inside would make Complete-mode output non-monotone for consumers
  * diffing snapshots). */
object StreamingTemplateDedup {

  /** `docStream` needs (doc_id, source, text); returns the running
    * per-template aggregate (gate with n_docs > 1 at read time). */
  def templateCounts(docStream: DataFrame, k: Int = 4): DataFrame =
    docStream
      .select(col("doc_id"), col("source"),
        lower(regexp_replace(
          concat_ws(" ", slice(split(col("text"), " "), 1, k)),
          "[0-9]+", "0")).as("template"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("exemplar"),
        approx_count_distinct(col("source")).as("n_sources"))
}
