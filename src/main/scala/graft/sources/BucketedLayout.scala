package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — Spark's pre-shuffled storage format, the
  * fact-×-fact join strategy when NEITHER side can broadcast.
  *
  * Why it matters at 100 TB: a shuffle join on two 100 TB fact tables
  * moves both sides over the network every time the join runs. Bucketing
  * pays that hash-partitioning cost ONCE at write: `bucketBy(n, key)`
  * hash-distributes rows into n files per partition by the join key and
  * records the layout in the catalog; any later equi-join (or groupBy) on
  * that key reads each bucket pair co-located — the planner drops BOTH
  * shuffle exchanges (asserted in the spec on the physical plan). The
  * nightly "join events against yesterday's enriched corpus" pipeline
  * becomes a map-side merge.
  *
  * Mechanics a 1000-executor deployment cares about, encoded here:
  *  - Both tables must agree on bucket COUNT and KEY, or the planner
  *    re-shuffles the disagreeing side (Spark can one-sided-coalesce when
  *    counts are integer multiples: `spark.sql.bucketing.coalesceBucketsInJoin`).
  *  - `sortBy` within buckets lets SortMergeJoin skip its sort stage too
  *    ([[writeBucketed]] sorts by the key; the spec asserts the join plan
  *    has no extra Sort beyond the bucket files' own order).
  *  - Bucket pruning: an equality predicate on the bucket key scans 1/n
  *    of the files.
  *
  * This complements [[graft.operators.ZOrder]]: z-ordering optimizes
  * RANGE scans (min/max pruning), bucketing optimizes JOINS and
  * GROUP BYs (co-location). A production corpus table typically buckets
  * by doc/join id and z-orders within buckets by the scan dimensions.
  */
object BucketedLayout {

  /** Write `df` as a bucketed, bucket-sorted catalog table at `path`
    * (external, so callers control the storage root). Overwrites. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int, path: String): Unit = {
    require(nBuckets >= 1, s"writeBucketed: nBuckets must be >= 1, got $nBuckets")
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", path.stripSuffix("/") + s"/$table")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Equi-join two same-bucketing tables on their bucket key — with
    * matching layouts the physical plan is a SortMergeJoin with ZERO
    * shuffle exchanges (each task reads bucket i of both sides). */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
