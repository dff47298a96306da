package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledJoin}

/** Plan-shape pins for the TPC-H completion set (q2..q22): each test
  * asserts the property that query exists to exercise — the decorrelation,
  * the semi/anti lowering, the pushdown — on the PHYSICAL plan, so losing
  * it is a CI failure instead of a silent 100× cluster regression.
  */
class TpchPlanSpec extends SparkSpec {

  private def plan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan

  private def phys(name: String): String = plan(name).toString

  private def joinCounts(p: SparkPlan): (Int, Int) = {
    val b = p.collect {
      case a: AdaptiveSparkPlanExec => joinCounts(a.initialPlan)._1
      case _: BroadcastHashJoinExec => 1
    }.sum
    val s = p.collect {
      case a: AdaptiveSparkPlanExec => joinCounts(a.initialPlan)._2
      case _: ShuffledJoin => 1
    }.sum
    (b, s)
  }

  /** Full pushed-filter list of every parquet scan in the plan — the
    * toString printout TRUNCATES PushedFilters at ~100 chars, so asserting
    * on the rendered plan can only ever see the first couple of entries. */
  private def pushedFilters(p: SparkPlan): List[String] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    def coll(q: SparkPlan): List[String] = q.collect {
      case a: AdaptiveSparkPlanExec => coll(a.initialPlan)
      case f: FileSourceScanExec => List(f.metadata.getOrElse("PushedFilters", ""))
    }.toList.flatten
    coll(p)
  }

  test("q6: the whole WHERE reaches the parquet scan; no join anywhere") {
    val p = phys("q6_forecast_revenue")
    val pushed = pushedFilters(plan("q6_forecast_revenue")).mkString("; ")
    // shipdate range, discount range, and quantity bound all pushed
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate lower not pushed: $pushed")
    assert(pushed.contains("LessThan(l_shipdate"), s"shipdate upper not pushed: $pushed")
    assert(pushed.contains("GreaterThanOrEqual(l_discount"), s"discount lower not pushed: $pushed")
    assert(pushed.contains("LessThan(l_quantity"), s"quantity bound not pushed: $pushed")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      s"column pruning lost: $readSchema")
    val (b, s) = joinCounts(plan("q6_forecast_revenue"))
    assert(b + s == 0, s"q6 is scan+agg only, found joins b=$b s=$s:\n$p")
  }

  test("q2: correlated min decorrelates to a window — no join-back of offers") {
    val p = phys("q2_min_cost_supplier")
    assert(p.contains("Window"), s"partition-min window missing:\n$p")
    // the offers relation must NOT be self-joined to apply the min; the
    // only joins are the broadcast dims (supplier chain + part)
    val (_, s) = joinCounts(plan("q2_min_cost_supplier"))
    assert(s == 0, s"offers must not shuffle-join back for the min, got $s:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 not lowered:\n$p")
  }

  test("q4: EXISTS lowers to a left-semi join; returnflag pushed to the scan") {
    val p = phys("q4_order_priority")
    assert(p.contains("LeftSemi"), s"EXISTS did not lower to a semi join:\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"lateness filter not pushed:\n$p")
  }

  test("q13: the outer join survives (zero-order customers must live)") {
    val p = phys("q13_order_distribution")
    assert(p.contains("LeftOuter"), s"left join lost (would drop 0-order custs):\n$p")
  }

  test("q18: HAVING side pre-aggregates to order grain; top-100 lowered") {
    val p = phys("q18_large_orders")
    assert(p.contains("TakeOrderedAndProject"), s"top-100 not lowered:\n$p")
    // sum_qty > 300 must gate AFTER the partial/final agg, not re-join rows
    assert(p.contains("(sum_qty"), s"having gate missing from plan:\n$p")
  }

  test("q19: per-table conjuncts of the OR-of-ANDs are inferred and pushed") {
    val p = phys("q19_disjunctive_pred")
    // Catalyst infers a part-side OR (brand/size) and a lineitem-side OR
    // (quantity windows) from the cross-table disjunction — both scans
    // must carry a pushed Or, else each reads its full table
    val pushed = pushedFilters(plan("q19_disjunctive_pred"))
    assert(pushed.count(_.contains("Or(")) >= 2,
      s"inferred per-table disjuncts not pushed to both scans:\n${pushed.mkString("\n")}\n$p")
  }

  test("q21: EXISTS/NOT EXISTS pair lowers to semi + anti, both equi-keyed") {
    val p = phys("q21_waiting_supplier")
    assert(p.contains("LeftSemi"), s"EXISTS not lowered to semi:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not lowered to anti:\n$p")
    assert(!p.contains("CartesianProduct"), s"self-join degenerated to a cross:\n$p")
  }

  test("q22: scalar avg broadcasts; no-orders gate is a left-anti join") {
    val p = phys("q22_global_sales")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not lowered to anti:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"1-row scalar must broadcast:\n$p")
  }

  test("q8: all five dims broadcast; lineitem never shuffles for a dimension") {
    val (b, s) = joinCounts(plan("q8_market_share"))
    // part/customer/amer/supplier/sn are hinted (amer itself contains the
    // nation x region broadcast = 6 hinted in total); lineitem x orders is
    // size-gated (broadcast at fixture scale, shuffled at production)
    assert(b >= 6, s"hinted dims must all be broadcast joins, got $b")
    assert(b + s == 7, s"expected 7 joins total, got b=$b s=$s")
  }
}
