package graft.streaming

import graft.llm.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.llm.Sketches.cmsCountersHashed]]: a running
  * CountMin counter table whose state is sharded BY HASH ROW — each of the
  * d=4 stateful groups owns one row's 512-long counter array, so the
  * sketch itself is distributed (no single task holds all d·w counters,
  * and each group's per-trigger input is exactly the token stream hashed
  * into its row).
  *
  * CMS merges by elementwise SUM, so the streaming fold is trivially
  * order-insensitive: after any stream prefix the state equals the batch
  * counter table of that prefix bit-for-bit (spec-asserted, including
  * mid-stream — the same parity contract as [[StreamingHll]], whose merge
  * is max, and [[StreamingKmv]], whose merge is bottom-k union).
  *
  * Each trigger emits only the (row, bucket, cnt) counters it touched —
  * counters are monotone, so latest-per-(row,bucket) downstream IS the
  * current sketch without re-emitting the untouched majority.
  */
object StreamingCms {

  /** (row, bucket, cnt) updates; `docs` needs a `text` column. */
  def run(docs: DataFrame): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    val rb = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .select(expr(s"xxhash64(token) & ${Long.MaxValue}L").as("h"))
      .withColumn("hm", expr(s"h % ${Sketches.CmsP}"))
      .select(explode(expr(Sketches.cmsBuckets)).as("rb"))
      .select(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .as[(Int, Long)]
    rb.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Long], (Int, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (row: Int, recs: Iterator[(Int, Long)],
         state: GroupState[Array[Long]]) =>
          val regs = state.getOption.getOrElse(new Array[Long](Sketches.CmsWidth))
          val touched = scala.collection.mutable.BitSet.empty
          recs.foreach { case (_, b) =>
            regs(b.toInt) += 1L
            touched += b.toInt
          }
          state.update(regs)
          touched.iterator.map(b => (row, b.toLong, regs(b)))
      }
      .toDF("row", "bucket", "cnt")
  }
}
