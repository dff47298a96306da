package graft.streaming

import graft.llm.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.llm.Sketches.lengthHistogram]]: a running
  * per-language log-bucket length histogram whose state is sharded BY
  * LANGUAGE — each stateful group owns one language's ≤ 64·QSub counters,
  * so no single task holds the whole sketch and each group's per-trigger
  * input is exactly its language's documents.
  *
  * The histogram merges by bucket-count SUM, so the streaming fold is
  * order-insensitive: after any stream prefix the state equals the batch
  * histogram of that prefix bit-for-bit (spec-asserted mid-stream — the
  * same parity contract as [[StreamingCms]]/[[StreamingHll]]/
  * [[StreamingKmv]]). Quantile read-out happens downstream with
  * [[graft.llm.Sketches.quantilesFromHistogram]] over the latest counters
  * per (lang, bucket).
  *
  * Each trigger emits only the (lang, bucket, rep, n) rows it touched —
  * counts are monotone, so latest-per-(lang, bucket) downstream IS the
  * current sketch without re-emitting the untouched majority.
  */
object StreamingQuantile {

  /** (lang, bucket, rep, n) updates; `docs` needs `lang` and `n_chars`. */
  def run(docs: DataFrame): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    val lb = docs
      .select(col("lang"),
        greatest(coalesce(col("n_chars"), lit(1L)), lit(1L)).cast("long").as("v"))
      .withColumn("e", (length(expr("bin(v)")) - 1).cast("long"))
      .withColumn("pe", expr("shiftleft(CAST(1 AS BIGINT), CAST(e AS INT))"))
      .withColumn("sub", expr(s"((v - pe) * ${Sketches.QSub}) div pe"))
      .select(col("lang"), (col("e") * Sketches.QSub + col("sub")).as("bucket"),
        expr(s"pe + (sub * pe) div ${Sketches.QSub}").as("rep"))
      .as[(String, Long, Long)]
    lb.groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, (Long, Long)], (String, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (lang: String, recs: Iterator[(String, Long, Long)],
         state: GroupState[Map[Long, (Long, Long)]]) =>
          var hist = state.getOption.getOrElse(Map.empty[Long, (Long, Long)])
          val touched = scala.collection.mutable.Set.empty[Long]
          recs.foreach { case (_, bucket, rep) =>
            val (_, n) = hist.getOrElse(bucket, (rep, 0L))
            hist = hist.updated(bucket, (rep, n + 1L))
            touched += bucket
          }
          state.update(hist)
          touched.iterator.map { b =>
            val (rep, n) = hist(b)
            (lang, b, rep, n)
          }
      }
      .toDF("lang", "bucket", "rep", "n")
  }
}
