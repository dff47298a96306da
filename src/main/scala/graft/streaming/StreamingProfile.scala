package graft.streaming

import graft.llm.Sketches
import graft.operators.TableProfile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TableProfile]]: a running per-column
  * profile over an unbounded stream — the data-quality monitor that watches
  * a 100 TB/day ingest instead of auditing it after the fact.
  *
  * Per column the state folds (n_rows, n_null, min, max) — all exactly
  * mergeable, so after any stream prefix they equal the batch profile of
  * that prefix bit-for-bit (spec-asserted) — plus a KMV bottom-k sketch
  * for the distinct count: exact distinct state is linear in the value
  * set (unbounded on a stream), the KMV merge is exact
  * ([[StreamingKmv]]'s argument), so `est_distinct` is the bottom-k
  * estimator — exact below k, ~1/√k error above. State is BOUNDED at
  * ~k longs + two extrema per column, forever.
  *
  * The stream is keyed by column index (the [[TableProfile.encodedCells]]
  * unpivot), so a table of any width profiles with #cols state keys;
  * string extrema compare in UTF-8 byte order, matching Spark SQL's
  * BINARY collation exactly (Java String.compareTo is UTF-16 code-unit
  * order — they disagree above the BMP). Output mode Update: one
  * refreshed profile row per column per batch that touched it.
  */
object StreamingProfile {

  private type ProfState =
    (Long, Long, Option[Long], Option[Long], Option[String], Option[String], Array[Long])

  /** UTF-8 binary order — parity with UTF8String.binaryCompare. */
  private[streaming] def leUtf8(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length <= y.length
  }

  /** (col_name, n_rows, n_null, est_distinct, min_v, max_v) updates. */
  def run(df: DataFrame, k: Int = 64): DataFrame = {
    require(k >= 2, s"StreamingProfile needs k >= 2, got $k")
    val fields = df.schema.fields.toIndexedSeq
    val session = df.sparkSession
    import session.implicits._
    val cells = TableProfile.encodedCells(df)
      .withColumn("h", when(col("num").isNotNull || col("str").isNotNull,
        pmod(xxhash64(col("num"), col("str")), lit(Sketches.KmvSpace))))
      .as[(Int, Option[Long], Option[String], Option[Long])]
    val folded = cells.groupByKey(_._1)
      .flatMapGroupsWithState[ProfState,
        (Int, Long, Long, Long, Option[Long], Option[Long], Option[String], Option[String])](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (idx: Int, rows: Iterator[(Int, Option[Long], Option[String], Option[Long])],
         state: GroupState[ProfState]) =>
          var (nr, nn, mnN, mxN, mnS, mxS, kmv) = state.getOption.getOrElse(
            (0L, 0L, Option.empty[Long], Option.empty[Long],
              Option.empty[String], Option.empty[String], Array.empty[Long]))
          val hs = scala.collection.mutable.ArrayBuffer.empty[Long]
          rows.foreach { case (_, num, str, h) =>
            nr += 1
            if (num.isEmpty && str.isEmpty) nn += 1
            num.foreach { v =>
              mnN = Some(mnN.fold(v)(math.min(_, v)))
              mxN = Some(mxN.fold(v)(math.max(_, v)))
            }
            str.foreach { v =>
              mnS = Some(mnS.fold(v)(p => if (leUtf8(p, v)) p else v))
              mxS = Some(mxS.fold(v)(p => if (leUtf8(p, v)) v else p))
            }
            h.foreach(hs += _)
          }
          // bottom-k of (previous bottom-k ∪ batch hashes): the KMV merge
          val merged = (kmv ++ hs).distinct.sorted.take(k)
          state.update((nr, nn, mnN, mxN, mnS, mxS, merged))
          val n = merged.length.toLong
          val est = if (n < k) n else (k - 1).toLong * Sketches.KmvSpace / merged.last
          Iterator.single((idx, nr, nn, est, mnN, mxN, mnS, mxS))
      }
      .toDF("idx", "n_rows", "n_null", "est_distinct", "mn_num", "mx_num", "mn_str", "mx_str")
    folded.select(
      TableProfile.colName(fields, col("idx")).as("col_name"),
      col("n_rows"), col("n_null"), col("est_distinct"),
      TableProfile.decodeMinMax(fields, col("idx"), col("mn_num"), col("mn_str")).as("min_v"),
      TableProfile.decodeMinMax(fields, col("idx"), col("mx_num"), col("mx_str")).as("max_v"))
  }
}
