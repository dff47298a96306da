package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared helpers for driver-checkable queries. */
object Util {

  /** Deterministic total order over every output column (sorted by name,
    * ASC NULLS FIRST) — mirrored by [[ob]] on the oracle side so the driver's
    * hash compare can never be broken by row order. */
  def orderAll(df: DataFrame): DataFrame =
    df.orderBy(df.columns.sorted.toIndexedSeq.map(c => col(c).asc_nulls_first): _*)

  /** DuckDB ORDER BY clause matching [[orderAll]]. */
  def ob(cols: String*): String =
    cols.sorted.map(c => s"$c ASC NULLS FIRST").mkString("ORDER BY ", ", ", "")

  /** Wrap a SELECT so the ORDER BY resolves only against output aliases. */
  def wrap(select: String, obCols: Seq[String]): String =
    s"SELECT * FROM (\n$select\n) zz ${ob(obCols: _*)}"
}
