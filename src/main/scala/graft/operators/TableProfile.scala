package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler — the Deequ/dbt-style "what is actually in this
  * table" operator a pipeline runs before committing a 100 TB plan to it:
  * per column, the null count, exact distinct count, and an
  * order-preserving string encoding of min/max. Output is long-format —
  * one row per column: (col_name, n_rows, n_null, n_distinct, min_v,
  * max_v) — so the profile of any table has ONE schema and profiles are
  * unionable across tables/snapshots.
  *
  * Shape: a single wide aggregate over ONE scan (all per-column metrics
  * are expressions in the same `agg`), then a `stack` unpivot of the 1-row
  * result — the unpivot touches #cols values, not data. The exact
  * `countDistinct` battery makes Catalyst plan an Expand (one replicate of
  * the scan output per distinct aggregate) feeding partial aggregation —
  * still one scan, map-side-combined, but shuffle bytes scale with
  * #distinct-columns × cardinality. That is the oracle-checkable form; at
  * 100 TB the production profile swaps `countDistinct` for
  * `approx_count_distinct` (HLL: no Expand, fixed-size sketch per column,
  * one shuffle row per partition) — same plan shape as
  * [[graft.llm.Sketches.hllDistinct]], which is the spec-verified sketch
  * this would delegate to.
  *
  * min/max encodings are chosen per type so DuckDB reproduces them
  * byte-for-byte: integrals/strings verbatim, doubles as integer cents
  * (`round(x·100)` — ULP-stable), timestamps as epoch micros, dates as
  * epoch days. Distinct counts are always over the RAW column (the cents
  * encoding is not injective; the count must not inherit its collisions).
  */
object TableProfile {

  def apply(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toIndexedSeq

    // Encoding the min/max AGGREGATES, not the per-row values: min/max must
    // run in the column's native (or numeric-encoded) order — stringifying
    // first would silently switch to lexicographic order ("999" > "14999").
    def orderedEncoding(f: StructField): Column = f.dataType match {
      case StringType | ByteType | ShortType | IntegerType |
           LongType | BooleanType                          => col(f.name)
      case FloatType | DoubleType =>
        round(col(f.name).cast(DoubleType) * 100).cast(LongType)
      case TimestampType | TimestampNTZType =>
        unix_micros(col(f.name).cast(TimestampType))
      case DateType                                        => unix_date(col(f.name))
      case other => throw new IllegalArgumentException(
        s"TableProfile: unsupported column type ${other.simpleString} for `${f.name}`")
    }

    val aggs = fields.flatMap { f =>
      val enc = orderedEncoding(f)
      Seq(
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"nn_${f.name}"),
        countDistinct(col(f.name)).as(s"nd_${f.name}"),
        min(enc).cast(StringType).as(s"mn_${f.name}"),
        max(enc).cast(StringType).as(s"mx_${f.name}"))
    }

    val prof = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val stackArgs = fields.map(f =>
      s"'${f.name}', nn_${f.name}, nd_${f.name}, mn_${f.name}, mx_${f.name}").mkString(", ")
    prof
      .select(col("n_rows"), expr(
        s"stack(${fields.length}, $stackArgs) AS (col_name, n_null, n_distinct, min_v, max_v)"))
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v")
  }
}
