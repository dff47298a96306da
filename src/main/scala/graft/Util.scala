package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared helpers for driver-checkable queries. */
object Util {

  /** Shared measurement-JSON persistence for the diagnostic mains (Bench /
    * ScaleStress / RecallProbe): stdout tails get truncated by the driver's
    * bounded capture, a file does not. `envVar` overrides `defaultPath`;
    * failure to write is a warning, never a run failure. */
  def writeJson(envVar: String, defaultPath: String, json: String): Unit = {
    val outPath = sys.env.getOrElse(envVar, defaultPath)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[json-out] could not write $outPath: ${e.getMessage}")
    }
  }

  /** Deterministic total order over every output column (sorted by name,
    * ASC NULLS FIRST) — mirrored by [[ob]] on the oracle side so the driver's
    * hash compare can never be broken by row order.
    *
    * Implemented as repartition(1) + local sort, NOT a global orderBy: range
    * partitioning runs a boundary-sampling pass that RE-EXECUTES the whole
    * upstream query (measured 2× on every harness query — e.g. simhash
    * pairs 2.8 s → 5.5 s), while a single-partition exchange makes one pass
    * and yields one output file whose row order is trivially total. This is
    * the test-harness ordering contract, not a production operator — result
    * sets here are small; sorting real corpus-scale output would use the
    * parallel orderBy. */
  def orderAll(df: DataFrame): DataFrame =
    df.repartition(1)
      .sortWithinPartitions(df.columns.sorted.toIndexedSeq.map(c => col(c).asc_nulls_first): _*)

  /** DuckDB ORDER BY clause matching [[orderAll]]. */
  def ob(cols: String*): String =
    cols.sorted.map(c => s"$c ASC NULLS FIRST").mkString("ORDER BY ", ", ", "")

  /** Wrap a SELECT so the ORDER BY resolves only against output aliases. */
  def wrap(select: String, obCols: Seq[String]): String =
    s"SELECT * FROM (\n$select\n) zz ${ob(obCols: _*)}"
}
