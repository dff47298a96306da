package graft

import graft.sources.BucketedLayout
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** The pre-shuffled storage contract: matching bucket layouts must join
  * and aggregate with ZERO shuffle exchanges (remaining sorts local,
  * never global) — asserted on the physical plan, because this is
  * exactly the property that silently disappears when someone changes a
  * bucket count on one side of a 100 TB fact-fact join. */
class BucketedLayoutSpec extends SparkSpec {

  // initialPlan, not inputPlan: Spark 4's inputPlan precedes
  // EnsureRequirements, so it never contains an exchange (see the
  // PlanAuditSpec.exchanges comment)
  private def shuffles(p: SparkPlan): Int = {
    def cnt(q: SparkPlan): Int = q.collect {
      case a: AdaptiveSparkPlanExec => cnt(a.initialPlan)
      case _: ShuffleExchangeLike   => 1
    }.sum
    cnt(p)
  }
  private def globalSorts(p: SparkPlan): Int = {
    def cnt(q: SparkPlan): Int = q.collect {
      case a: AdaptiveSparkPlanExec     => cnt(a.initialPlan)
      case s: SortExec if s.global      => 1
    }.sum
    cnt(p)
  }

  test("bucketed join: matching layouts drop both shuffles (sorts stay local); results identical to the shuffled join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val orders = Tables.table(spark, sf, "orders")
    val customer = Tables.table(spark, sf, "customer")
    // one writer task ⇒ one file per bucket (multiple files per bucket
    // would concatenate sorted runs and genuinely need the local re-sort)
    BucketedLayout.writeBucketed(orders.repartition(1), "orders_b", "o_custkey", 4, dir)
    BucketedLayout.writeBucketed(
      customer.repartition(1).withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", 4, dir)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = BucketedLayout.coLocatedJoin(spark, "orders_b", "customer_b", "o_custkey")
      val plan = j.queryExecution.executedPlan
      assert(plan.toString.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(shuffles(plan) == 0, s"bucketed join must not shuffle:\n$plan")
      // since Spark 3.0 the reader no longer reports bucket-sort order
      // (SPARK-28067 family: multi-file buckets broke it), so an in-task
      // LOCAL sort remains — the scale property is that no sort (or
      // anything else) is GLOBAL: zero exchanges means the lingering sorts
      // are per-bucket, memory-bounded, and network-free
      assert(globalSorts(plan) == 0, s"no global sort may appear:\n$plan")

      // identical result to the plain shuffled join over the raw frames
      val expected = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey").count()
      assert(j.count() == expected, "bucketed join changed the result")

      // groupBy on the bucket key aggregates in place: zero exchanges
      val agg = spark.table("orders_b").groupBy("o_custkey")
        .agg(sum("o_totalprice").as("s"))
      assert(shuffles(agg.queryExecution.executedPlan) == 0,
        s"bucket-key aggregation must not shuffle:\n${agg.queryExecution.executedPlan}")

      // mismatched bucket counts re-shuffle the disagreeing side — the
      // failure mode the layout contract exists to prevent
      BucketedLayout.writeBucketed(
        customer.repartition(1).withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b3", "o_custkey", 3, dir)
      val mism = BucketedLayout.coLocatedJoin(spark, "orders_b", "customer_b3", "o_custkey")
      assert(shuffles(mism.queryExecution.executedPlan) >= 1,
        s"mismatched bucket counts cannot be co-located — expected a shuffle:\n${mism.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      Seq("orders_b", "customer_b", "customer_b3")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
