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
  * Shape — unpivot first, then count-by-value, then aggregate the counts:
  *
  *   scan → posexplode (one (idx, num, str) row per cell)
  *        → HashAggregate on (idx, value) with count(1)       [shuffle 1]
  *        → per-column aggregate of the counted values        [shuffle 2]
  *
  * Everything derives from the value-count frame in one linear chain: n_rows
  * = Σcnt, n_null = Σcnt over null values, n_distinct = #non-null rows,
  * min/max over the value key — ONE scan, no self-join. This deliberately
  * avoids the naive `agg(countDistinct(a), countDistinct(b), …, min(s)…)`
  * form, which planned 2.5× slower (measured sf0.1): Catalyst's
  * multi-distinct rewrite Expands the scan ×(#cols+1) and the string min/max
  * buffers force SortAggregate, so the whole expanded set gets sorted on a
  * 7-column key. Here stage 1 is a hash aggregate (count buffer only — value
  * strings are grouping KEYS, which hash aggregation handles; it's string
  * agg BUFFERS it can't) and partial aggregation collapses duplicates
  * map-side; the only sort-based aggregate left runs over the already-
  * distinct values. At 100 TB the same chain holds: shuffle 1 is keyed by
  * (column, value) — fully spread; shuffle 2 moves only per-partition
  * partial rows (#partitions × #cols), never the value set. The exact
  * distinct count is the oracle-checkable form; cheaper production twins
  * are `approx_count_distinct` (HLL) or the KMV-sketched running profile
  * in [[graft.streaming.StreamingProfile]].
  *
  * Values ride a two-typed encoding (num: long, str: string) so one stack
  * schema fits every column, ordered numerically where the source is
  * numeric: integrals verbatim, booleans as 0/1, doubles as cents
  * (`round(x·100)` — ULP-stable), timestamps as epoch micros, dates as
  * epoch days; min/max decode back to strings per column at the end.
  */
object TableProfile {

  /** (numeric encoding, string encoding): exactly one is non-null for a
    * non-null cell, both null for a null cell. */
  private def encoded(f: StructField): (Column, Column) = f.dataType match {
    case StringType => (lit(null).cast(LongType), col(f.name))
    case ByteType | ShortType | IntegerType | LongType | BooleanType =>
      (col(f.name).cast(LongType), lit(null).cast(StringType))
    case FloatType | DoubleType =>
      (round(col(f.name).cast(DoubleType) * 100).cast(LongType),
        lit(null).cast(StringType))
    case TimestampType | TimestampNTZType =>
      (unix_micros(col(f.name).cast(TimestampType)), lit(null).cast(StringType))
    case DateType => (unix_date(col(f.name)).cast(LongType), lit(null).cast(StringType))
    case other => throw new IllegalArgumentException(
      s"TableProfile: unsupported column type ${other.simpleString} for `${f.name}`")
  }

  /** The unpivoted cell frame (idx, num, str) — shared with the streaming
    * twin so batch and stream profile the identical encoding. */
  private[graft] def encodedCells(df: DataFrame): DataFrame =
    df.select(posexplode(array(df.schema.fields.toIndexedSeq.map { f =>
      val (num, str) = encoded(f)
      struct(num.as("num"), str.as("str"))
    }: _*)).as(Seq("idx", "cell")))
      .select(col("idx"), col("cell.num").as("num"), col("cell.str").as("str"))

  /** Decode an aggregated (num, str) extremum back to a string per column:
    * booleans to true/false, other numerics as the encoded integer's
    * decimal string, strings verbatim. */
  private[graft] def decodeMinMax(fields: Seq[StructField], idx: Column,
                                  mnum: Column, mstr: Column): Column = {
    val boolIdxs = fields.zipWithIndex.collect {
      case (f, i) if f.dataType == BooleanType => i
    }
    val asBool = (mnum === 1L).cast(StringType)
    boolIdxs.foldLeft(coalesce(mnum.cast(StringType), mstr)) { (acc, i) =>
      when(idx === i, asBool).otherwise(acc)
    }
  }

  private[graft] def colName(fields: Seq[StructField], idx: Column): Column =
    element_at(array(fields.map(f => lit(f.name)): _*), idx + 1)

  def apply(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toIndexedSeq
    val cells = encodedCells(df)
    val isNull = col("num").isNull && col("str").isNull
    val counted = cells.groupBy("idx", "num", "str").agg(count(lit(1)).as("cnt"))
    val agg = counted.groupBy("idx").agg(
      sum(col("cnt")).as("n_rows"),
      coalesce(sum(when(isNull, col("cnt"))), lit(0L)).as("n_null"),
      count(when(!isNull, lit(1))).as("n_distinct"),
      min(col("num")).as("mn_num"), max(col("num")).as("mx_num"),
      min(col("str")).as("mn_str"), max(col("str")).as("mx_str"))
    agg.select(
      colName(fields, col("idx")).as("col_name"),
      col("n_rows"), col("n_null"), col("n_distinct"),
      decodeMinMax(fields, col("idx"), col("mn_num"), col("mn_str")).as("min_v"),
      decodeMinMax(fields, col("idx"), col("mx_num"), col("mx_str")).as("max_v"))
  }
}
