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
  * exchange is even. A pathologically hot key would serialize its sort
  * under the plain plan; pass `bucketSeconds > 0` to add the time bucket as
  * a secondary partition key — the hot key's rows then spread over
  * (time-range / bucketSeconds) partitions, each sorted independently, and
  * correctness is restored by seeding every left bucket with the carry-in
  * payload (the latest right payload from strictly earlier buckets,
  * computed over per-bucket aggregates — |distinct buckets| rows per key,
  * never the raw rows). Same algebra, two extra small exchanges; results
  * are bit-identical to the plain plan.
  *
  * NULL semantics match SQL: a left row with a NULL key or NULL timestamp
  * matches nothing (right rows with NULL keys/timestamps are dropped —
  * `=` and `>=` never hold on NULL).
  *
  * @param payload right-side columns to attach, as (rightCol -> outputName);
  *                include `rightTime` to surface the matched timestamp.
  * @param bucketSeconds 0 (default) = single per-key partition; > 0 = skew
  *                mode, time axis binned into buckets of this many seconds
  *                (for a LONG time axis: this many units). Pick it so a hot
  *                key's densest bucket fits one task — e.g. 3600 for
  *                hourly-session CDR dims.
  */
object AsOfJoin {

  def leftAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               payload: Seq[(String, String)],
               bucketSeconds: Long = 0L): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi key")
    val reserved = Seq("__t", "__side", "__pay", "__m", "__b")
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
    val matched =
      if (bucketSeconds <= 0L) {
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t").asc_nulls_first, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        lPrep.unionByName(rPart)
          .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
          .filter(col("__side") === 1)
      } else {
        // skew mode: partition by (keys, time bucket). A left row whose
        // predecessor lives in an earlier bucket is covered by a per-bucket
        // seed row carrying the cross-bucket running payload.
        // double keeps both TIMESTAMP (epoch seconds + fraction) and LONG
        // axes exact up to 2^53 — fine for any epoch-based time
        def bucketOf(t: Column): Column = floor(t.cast("double") / bucketSeconds)

        // latest payload within each right bucket: __t is unique per key
        // after pre-reduction, so max(struct(__t, __pay)) is deterministic
        val rBucketLast = rPrep.withColumn("__b", bucketOf(col("__t")))
          .groupBy((keys.map(col) :+ col("__b")): _*)
          .agg(max(struct(col("__t"), col("__pay"))).as("__bl"))
          .select((keys.map(col) :+ col("__b") :+ lit(1).as("__side") :+
            col("__bl.__pay").as("__pay")): _*)
        // one marker per (keys, bucket) the left side actually populates;
        // side 0 < 1 ⇒ at equal __b the marker sorts BEFORE the right
        // bucket-last, so the carry-in is from STRICTLY earlier buckets
        // (same-bucket right rows are already in the main union)
        val lMarkers = lPrep.filter(col("__t").isNotNull)
          .select((keys.map(col) :+ bucketOf(col("__t")).as("__b")): _*)
          .distinct()
          .withColumn("__side", lit(0))
          .withColumn("__pay", lit(null).cast(payType))
        val wSeed = Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__b").asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val seeds = lMarkers.unionByName(rBucketLast)
          .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(wSeed))
          .filter(col("__side") === 0 && col("__m").isNotNull)
        // seed rows look like right rows with a NULL time: __t nulls-first
        // puts them ahead of every real row in their bucket
        val seedRows = seeds.select(
          (left.columns.toSeq.map { c =>
            if (keys.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType).as(c)
          } :+ lit(null).cast(lPrep.schema("__t").dataType).as("__t") :+
            lit(0).as("__side") :+ col("__m").as("__pay") :+ col("__b")): _*)

        val w = Window.partitionBy((keys.map(col) :+ col("__b")): _*)
          .orderBy(col("__t").asc_nulls_first, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        lPrep.withColumn("__b", bucketOf(col("__t")))
          .unionByName(rPart.withColumn("__b", bucketOf(col("__t"))))
          .unionByName(seedRows)
          .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
          .filter(col("__side") === 1)
          .drop("__b")
      }

    payload.foldLeft(matched) { case (df, (src, out)) =>
      df.withColumn(out, col("__m").getField(src))
    }.drop("__t", "__side", "__pay", "__m")
  }
}
