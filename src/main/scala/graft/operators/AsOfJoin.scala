package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed left as-of join: for each left row, attach the single right
  * row with the greatest `rightTime <= leftTime` among rows matching the
  * equi keys (the "latest dimension state as of the fact's timestamp"
  * semantic — exactly what the reference's range join + argmax dedup
  * computes in two steps, EnrichmentApp.java:320-340 + :376-403).
  *
  * Spark has no built-in as-of join, and the naive range-join + per-key
  * argmax explodes: every fact row is first matched against *all* earlier
  * dim sessions (the J3/J4 plan), producing an O(|facts| × sessions-per-key)
  * intermediate that the dedup then throws away. This operator is the scale
  * path: it never materializes candidates.
  *
  * Physical shape (union-sort, the classic distributed as-of):
  *   1. right side is pre-reduced to one row per (keys, rightTime) with a
  *      deterministic whole-row argmax (ties can't make results flap);
  *   2. both sides are tagged and unioned — ONE hash exchange on the keys,
  *      one sort by (time, side) inside each partition;
  *   3. a running `last(payload, ignoreNulls)` over
  *      (unbounded preceding .. current row) gives every left row the most
  *      recent right payload at-or-before its timestamp (`side` orders a
  *      right row *before* a left row at the same timestamp ⇒ inclusive >=).
  *
  * Cost: shuffle(|L| + |R|) + per-partition sort — independent of match
  * fan-out. At 100 TB, keys are (probe, ip)-grade high-cardinality, so the
  * exchange is even; a pathologically hot key serializes its sort, and the
  * standard fix (bucket the time axis into coarse ranges as a secondary
  * partition key, carrying each bucket's last payload over as a seed row)
  * composes with this plan without changing the algebra.
  *
  * NULL semantics match SQL: a left row with a NULL key or NULL timestamp
  * matches nothing (right rows with NULL keys/timestamps are dropped —
  * `=` and `>=` never hold on NULL).
  *
  * @param payload right-side columns to attach, as (rightCol -> outputName);
  *                include `rightTime` to surface the matched timestamp.
  */
object AsOfJoin {

  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi key")
    val reserved = Seq("__t", "__side", "__pay", "__m")
    require(!left.columns.exists(reserved.contains),
      s"left side must not contain the operator's scratch columns $reserved")
    // columns carried in the payload struct: argmax tie-break fields are the
    // non-key/non-time ones, but key columns a caller asks for (e.g. 'which
    // ip matched') must still be present for the final getField projection
    val paySrcs = payload.map(_._1).distinct
    val vals = paySrcs.filterNot(c => keys.contains(c) || c == rightTime)
    val payKeys = paySrcs.filter(c => keys.contains(c) && c != rightTime)

    // 1. deterministic pre-reduction: one right row per (keys, rightTime)
    val nonNull: Column = (keys :+ rightTime).map(col(_).isNotNull).reduce(_ && _)
    val rdd = right.filter(nonNull)
      .groupBy((keys :+ rightTime).map(col): _*)
      .agg(max(struct((if (vals.isEmpty) Seq(lit(1).as("__one")) else vals.map(col)): _*)).as("__v"))
    val rPrep = rdd.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+
        struct((col(rightTime) +: vals.map(v => col(s"__v.$v").as(v))) ++
          payKeys.map(col): _*).as("__pay")): _*)
    val payType = rPrep.schema("__pay").dataType

    // 2. tag + union (left columns are NULL on right-side rows except keys)
    val lPrep = left.select(
      (left.columns.toSeq.map(col) :+ col(leftTime).as("__t") :+
        lit(1).as("__side") :+ lit(null).cast(payType).as("__pay")): _*)
    val rPart = rPrep.select(
      (left.columns.toSeq.map { c =>
        if (keys.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType).as(c)
      } :+ col("__t") :+ lit(0).as("__side") :+ col("__pay")): _*)

    // 3. running latest-payload; NULL left timestamps sort first ⇒ no match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc_nulls_first, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lPrep.unionByName(rPart)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    payload.foldLeft(matched) { case (df, (src, out)) =>
      df.withColumn(out, col("__m").getField(src))
    }.drop("__t", "__side", "__pay", "__m")
  }
}
