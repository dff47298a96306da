package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.llm.Sketches.hllDistinctHashed]]: a running
  * per-language distinct-token estimate whose state is a FIXED 64-int
  * register array per language — HLL's merge (elementwise max) makes the
  * streaming fold trivially order-insensitive, so after any stream prefix
  * the state equals the batch register table of that prefix bit-for-bit
  * (spec-asserted, including mid-stream).
  *
  * Contrast with [[StreamingKmv]]: KMV state is k hashes (8·k bytes),
  * HLL's is 64 small ints regardless of k — the cheapest possible
  * unbounded-cardinality state. ρ here is
  * `numberOfTrailingZeros(rest) + 1`, the Scala evaluation of the exact
  * `bit_count((rest & -rest) - 1) + 1` arithmetic the batch/oracle path
  * uses; the parity spec pins the two.
  */
object StreamingHll {

  /** (lang, n_nonempty, est_distinct) updates; `docs` needs (lang, text). */
  def run(docs: DataFrame): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    val hashes = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .select(col("lang"), expr(s"xxhash64(token) & ${Long.MaxValue}L").as("h"))
      .as[(String, Long)]
    hashes.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Int], (String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (lang: String, rows: Iterator[(String, Long)],
         state: GroupState[Array[Int]]) =>
          val regs = state.getOption.getOrElse(new Array[Int](64))
          rows.foreach { case (_, h) =>
            val bucket = (h % 64).toInt
            val rest = h / 64
            val rho = if (rest == 0L) 58
              else java.lang.Long.numberOfTrailingZeros(rest) + 1
            if (rho > regs(bucket)) regs(bucket) = rho
          }
          state.update(regs)
          val nonEmpty = regs.count(_ > 0)
          val s = regs.iterator.filter(_ > 0).map(r => 1048576L >> r).sum +
            (64L - nonEmpty) * 1048576L
          val est = (709L * 64 * 64 * 1048576L) / (1000L * s)
          Iterator.single((lang, nonEmpty.toLong, est))
      }
      .toDF("lang", "n_nonempty", "est_distinct")
  }
}
