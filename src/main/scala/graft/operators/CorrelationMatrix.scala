package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlations of numeric columns in ONE pass — the
  * feature-redundancy diagnostic run before a training-data pipeline picks
  * signals (two quality scores correlating at 0.98 are one signal, not
  * two). Output is long-format: one (col_a, col_b, corr_v) row per
  * unordered column pair (a < b positionally), so matrices of any width
  * share a schema.
  *
  * Shape: every pair's `corr` lands in the SAME `agg` over one scan —
  * k(k−1)/2 co-moment accumulators advancing in lockstep per row. Spark's
  * Corr is a declarative aggregate (count/mean/co-moment buffer), so the
  * map side emits one fixed-size buffer per pair per partition and the
  * final reduce merges #partitions × k²/2 buffers into a single row: scan
  * volume never re-reads, shuffle volume is independent of row count. At
  * 100 TB the plan is identical — this is the textbook
  * "sufficient-statistics in one pass" shape, and it is why the operator
  * takes explicit column names instead of profiling all k² pairs of a
  * 1000-column table (quadratic buffer width is the knob the caller owns).
  *
  * `corr_v` is rounded to 6 dp on both engines: co-moment merge order
  * differs between Spark and DuckDB (and between partitionings), so the
  * raw doubles disagree in trailing ULPs while the rounded values are
  * stable.
  */
object CorrelationMatrix {

  def apply(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns, got $cols")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.map { case ((a, b), k) =>
      round(corr(col(a), col(b)), 6).as(s"c$k")
    }
    val one = df.agg(aggs.head, aggs.drop(1): _*)
    val stackArgs = pairs.zipWithIndex
      .map { case ((a, b), k) => s"'$a', '$b', c$k" }.mkString(", ")
    one.select(expr(
      s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, corr_v)"))
  }
}
