package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule: rewrite a naive time-range theta join into the banded
  * (binned) equi-join — the logical-plan form of
  * [[graft.operators.IntervalJoin]], applied automatically so users can
  * write the natural predicate
  *
  * {{{ a JOIN b ON ... AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL h }}}
  *
  * (SQL or DataFrame — anything that lowers to these conjuncts) and still
  * get the scalable plan. Without the rewrite Spark extracts only the
  * other equi-keys (or none) and evaluates the range per pair — O(rows²)
  * inside each key group. With it, both sides gain a `horizon`-wide
  * time-bucket column; `b.ts ∈ [a.ts, a.ts+h]` implies `bin(b) ∈ {bin(a),
  * bin(a)+1}` (bins are exactly h micros wide), so adding
  * `bin_l = bin_r` — with the left row exploded into its own and the next
  * bucket — turns the join into a hash-partitionable equi-join; the
  * original range conjuncts remain and do the exact filtering inside each
  * bucket. A pair can collide in at most one bucket, so no dedup is
  * needed and row multiplicity is preserved.
  *
  * Match requirements (conservative by design):
  *  - inner join whose condition conjuncts contain `tsR >= tsL` and
  *    `tsR <= tsL + INTERVAL` on bare timestamp attributes, one from each
  *    side, with a positive literal day-time interval;
  *  - the rewrite marker (`__graft_bin`) is not already present (the added
  *    conjunct keeps the original range predicates, which would otherwise
  *    re-match forever);
  *  - `spark.graft.bandedIntervalJoin.enabled` (default true) — kill
  *    switch;
  *  - at least ONE side's estimated size exceeds
  *    `spark.graft.bandedIntervalJoin.smallSideThreshold` bytes (default
  *    64 KB; 0 = always rewrite) — i.e. the rule skips only when the
  *    WHOLE join is tiny. A huge probe against a tiny dim still rewrites:
  *    a nested loop there costs |L|·|dim| predicate evaluations even
  *    though the dim broadcasts, exactly what banding removes (the banded
  *    equi-join stays broadcast when a side is small, so the rewrite loses
  *    nothing). Deliberately NOT gated on `autoBroadcastJoinThreshold`:
  *    broadcastability bounds *memory*, not compute;
  *  - no cross-side equality conjunct, unless
  *    `spark.graft.bandedIntervalJoin.bandEquiJoins` (default false) is
  *    set. With an equi key present Spark hash-joins on it and the range
  *    rides as a post-join filter — usually right, and banding would add a
  *    2× probe-side explode. The opt-in exists for HOT equi keys (few
  *    distinct values, many rows each), where per-key work is
  *    O(rows-per-key²) and appending the bin key restores
  *    output-proportional cost.
  *
  * Registered via [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`).
  */
object BandedIntervalJoinRule extends Rule[LogicalPlan] {

  private val BinName = "__graft_bin"

  private def enabled: Boolean =
    conf.getConfString("spark.graft.bandedIntervalJoin.enabled", "true").toBoolean

  /** Skip the rewrite when BOTH sides are under this many bytes
    * (estimated); 0 disables the guard. It must be both: a huge probe side
    * against a tiny dim is exactly the case the rewrite exists for — a
    * broadcast nested-loop there still evaluates |probe| × |dim| range
    * predicates, while the banded equi-join hashes. Only when the whole
    * join is tiny is the nested loop cheaper than the 2× bin explode +
    * shuffle. See the scaladoc for why this is NOT
    * `autoBroadcastJoinThreshold`. */
  private def smallSideThreshold: Long =
    conf.getConfString("spark.graft.bandedIntervalJoin.smallSideThreshold",
      "65536").toLong

  private def tooSmall(left: LogicalPlan, right: LogicalPlan): Boolean = {
    val t = smallSideThreshold
    t > 0 && (left.stats.sizeInBytes.max(right.stats.sizeInBytes) <= t)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Opt-in: band joins that already carry an equi key — for the hot-key
    * regime (few distinct equi values, many rows per key) where the hash
    * join alone does O(rows-per-key²) range evaluations inside each group. */
  private def bandEquiJoins: Boolean =
    conf.getConfString("spark.graft.bandedIntervalJoin.bandEquiJoins",
      "false").toBoolean

  /** A cross-side equality conjunct means Spark already plans a hash join
    * on it (ExtractEquiJoinKeys) and the range predicate rides along as a
    * post-join filter — banding there would only add a 2× explode to the
    * probe side, UNLESS the equi key is hot (see [[bandEquiJoins]]). The
    * default rewrite is for PURE range joins, which otherwise degenerate
    * to a nested loop. */
  private def hasEquiKey(cs: Seq[Expression], left: LogicalPlan,
                         right: LogicalPlan): Boolean = {
    def crossSide(a: Expression, b: Expression): Boolean = (a, b) match {
      case (x: AttributeReference, y: AttributeReference) =>
        (left.outputSet.contains(x) && right.outputSet.contains(y)) ||
          (left.outputSet.contains(y) && right.outputSet.contains(x))
      case _ => false
    }
    cs.exists {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }
  }

  /** `ts + INTERVAL h` with a literal positive day-time interval → h µs. */
  private object TsPlusInterval {
    def unapply(e: Expression): Option[(AttributeReference, Long)] = e match {
      case add: TimestampAddInterval => add.children match {
        case Seq(ts: AttributeReference, Literal(h: Long, _: DayTimeIntervalType))
          if h > 0 => Some((ts, h))
        case _ => None
      }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // isStreaming guard: a stream-stream interval join is already
    // state-bounded by its watermarks; exploding the buffered side would
    // double join state and shuffle for no benefit.
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.isStreaming && enabled && !tooSmall(left, right) &&
          !j.output.exists(_.name.startsWith(BinName)) &&
          !cond.references.exists(_.name.startsWith(BinName)) =>
      val cs = conjuncts(cond)
      if (hasEquiKey(cs, left, right) && !bandEquiJoins) j else {
      // every tsR >= tsL candidate — the first one is not necessarily the
      // one with a matching upper bound (e.g. an extra one-sided timestamp
      // guard listed before the real range pair)
      val lowers = cs.collect {
        case GreaterThanOrEqual(r: AttributeReference, l: AttributeReference)
            if r.dataType == TimestampType && right.outputSet.contains(r) &&
              left.outputSet.contains(l) => (l, r)
        case LessThanOrEqual(l: AttributeReference, r: AttributeReference)
            if l.dataType == TimestampType && left.outputSet.contains(l) &&
              right.outputSet.contains(r) => (l, r)
      }
      val rewritten = lowers.view.flatMap { case (tsL, tsR) =>
        cs.collectFirst {
          case LessThanOrEqual(r: AttributeReference, TsPlusInterval(l, h))
              if r.semanticEquals(tsR) && l.semanticEquals(tsL) => h
          case GreaterThanOrEqual(TsPlusInterval(l, h), r: AttributeReference)
              if r.semanticEquals(tsR) && l.semanticEquals(tsL) => h
        }.map((tsL, tsR, _))
      }.headOption.map { case (tsL, tsR, horizon) =>

        def bin(ts: Expression): Expression =
          new IntegralDivide(new UnixMicros(ts), Literal(horizon))
        val binR = Alias(bin(tsR), s"${BinName}_r")()
        val rhs = Project(right.output :+ binR, right)
        val binLAttr = AttributeReference(s"${BinName}_l", LongType)()
        val lhs = Generate(
          new Explode(CreateArray(Seq(bin(tsL), new Add(bin(tsL), Literal(1L))))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(binLAttr), child = left)
        val newJoin = Join(lhs, rhs, Inner,
          Some(And(cond, EqualTo(binLAttr, binR.toAttribute))), hint)
        Project(j.output, newJoin)
      }
      rewritten.getOrElse(j)
      }
  }
}
