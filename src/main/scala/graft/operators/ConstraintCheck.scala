package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deequ-style declarative constraint checker — the validation gate a
  * pipeline runs on every snapshot before exposing it downstream: each
  * rule yields one (rule, n_violations, n_checked) row, so the check of
  * any table is a small unionable report and "is this snapshot clean"
  * is `max(n_violations) == 0`.
  *
  * Scale shape, per rule class:
  *  - [[ConstraintCheck.NotNull]] / [[ConstraintCheck.InRange]] — ALL
  *    row-local rules fold into ONE shared aggregate over ONE scan
  *    (a conditional count per rule: k rules cost k counters, not k
  *    passes);
  *  - [[ConstraintCheck.Unique]] — one count-by-key aggregation; the
  *    violation count is Σ(cnt−1) over duplicated keys, partial-aggregated
  *    map-side so the shuffle carries keys, not rows;
  *  - [[ConstraintCheck.ForeignKey]] — a LEFT ANTI join against the
  *    referenced key set; the dim side is distinct-projected first and
  *    broadcasts when small (the planner's choice — at 100 TB × 100 TB the
  *    same anti join shuffles on the key, which is exactly the join the
  *    constraint's semantics require).
  *
  * Violation counts are counts, not row dumps — a 100 TB check emits a
  * #rules-row report; drill-down into offending rows is a follow-up
  * filtered query, not part of the gate.
  */
object ConstraintCheck {

  sealed trait Rule { def name: String }
  /** `col IS NOT NULL`. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** Closed interval on a numeric column; either bound optional. */
  final case class InRange(col: String, lo: Option[Double], hi: Option[Double])
      extends Rule {
    def name = s"range($col,${lo.getOrElse("")},${hi.getOrElse("")})"
  }
  /** Key (or composite key) appears at most once. */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** Every non-null `col` value exists in `dim.dimCol`. */
  final case class ForeignKey(col: String, dim: DataFrame, dimCol: String)
      extends Rule {
    def name = s"fk($col->$dimCol)"
  }

  def apply(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "ConstraintCheck needs at least one rule")
    val rowLocal = rules.collect {
      case r: NotNull => r.name -> col(r.col).isNull
      case r: InRange =>
        val c = col(r.col)
        val lo = r.lo.map(v => c < v)
        val hi = r.hi.map(v => c > v)
        r.name -> (lo ++ hi).reduceOption(_ || _).getOrElse(lit(false))
    }
    val localReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.zipWithIndex.flatMap { case ((_, bad), i) =>
          Seq(sum(when(bad, 1L).otherwise(0L)).as(s"v$i"),
            count(lit(1)).as(s"n$i"))
        }
        val one = df.agg(aggs.head, aggs.drop(1): _*)
        val stackArgs = rowLocal.zipWithIndex
          .map { case ((name, _), i) => s"'$name', v$i, n$i" }.mkString(", ")
        Some(one.select(expr(
          s"stack(${rowLocal.size}, $stackArgs) AS (rule, n_violations, n_checked)")))
      }
    val keyReports = rules.collect {
      case r: Unique =>
        df.groupBy(r.cols.map(col): _*).agg(count(lit(1)).as("cnt"))
          .agg(coalesce(sum(col("cnt") - 1L), lit(0L)).as("n_violations"),
            coalesce(sum(col("cnt")), lit(0L)).as("n_checked"))
          .select(lit(r.name).as("rule"), col("n_violations"), col("n_checked"))
      case r: ForeignKey =>
        // one probe pass: LEFT join against the distinct key set (no
        // fan-out) and count misses — an anti join plus a separate
        // n_checked count would scan the probe twice
        val probe = df.filter(col(r.col).isNotNull).select(col(r.col))
        val keys = r.dim.select(col(r.dimCol).as(r.col)).distinct()
          .withColumn("__hit", lit(1))
        probe.join(keys, Seq(r.col), "left")
          .agg(coalesce(sum(when(col("__hit").isNull, 1L).otherwise(0L)), lit(0L))
              .as("n_violations"),
            count(lit(1)).as("n_checked"))
          .select(lit(r.name).as("rule"), col("n_violations"), col("n_checked"))
    }
    (localReport.toSeq ++ keyReports).reduceLeft(_ unionByName _)
  }
}
