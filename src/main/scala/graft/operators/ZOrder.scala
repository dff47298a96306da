package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering for
  * scan pruning, the Delta Lake `OPTIMIZE ZORDER BY` / Iceberg sort-order
  * capability re-expressed with plain Spark primitives.
  *
  * Why it matters at 100 TB: parquet footers carry per-row-group min/max
  * for every column, and the reader skips row groups whose range cannot
  * match a pushed-down predicate. A table sorted by ONE key prunes only
  * on that key; interleaving the bits of TWO keys gives a curve where
  * every file holds a small rectangle of the (x, y) space, so a range
  * predicate on EITHER dimension touches ~√(selectivity) of the files
  * instead of all of them. The layout is pure organization — row content
  * is untouched, queries need no rewrite, and the win is measured (not
  * asserted) in the spec: the same user-range filter over the same rows
  * touches strictly fewer files after [[zOrdered]] than after a
  * time-ordered write.
  *
  * [[zValue]] is a codegen'd integer expression (shift/and/add only — no
  * UDF), so computing the curve key adds one narrow projection to the
  * write; the range partitioner then splits the curve into `numFiles`
  * contiguous segments, one output file each.
  */
object ZOrder {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into one Morton key in [0, 4^bits). Inputs MUST already
    * lie in [0, 2^bits) — map skewed/unbounded domains through
    * [[bounded]] (modulo) or a rank/bucket first; values outside the
    * domain silently fold, which is a layout (not correctness) concern. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zValue: 1 <= bits <= 31, got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Fold an arbitrary non-negative integer column into the [0, 2^bits)
    * z-domain. */
  def bounded(c: Column, bits: Int = 16): Column =
    pmod(c.cast("long"), lit(1L << bits))

  /** The frame re-clustered along the Morton curve: `numFiles` contiguous
    * curve segments (range partition), rows sorted by curve position
    * within each — written as-is this yields one tight (x, y) rectangle
    * per file. The curve key is dropped before handing back: layout is
    * the writer's concern, not the schema's. */
  def zOrdered(df: DataFrame, x: Column, y: Column, bits: Int = 16,
               numFiles: Int = 64): DataFrame =
    df.withColumn("_z", zValue(x, y, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** Write `df` z-ordered by (x, y) as parquet — the OPTIMIZE-shaped
    * entry point. */
  def writeZOrdered(df: DataFrame, path: String, x: Column, y: Column,
                    bits: Int = 16, numFiles: Int = 64): Unit =
    zOrdered(df, x, y, bits, numFiles).write.mode("overwrite").parquet(path)
}
