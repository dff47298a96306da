package graft

import graft.functions.{DotProduct, VectorFunctions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: install the engine's native expressions
  * and optimizer rules into every session on a cluster via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no driver code
  * required, SQL and DataFrame users both get `vec_dot` and the
  * banded-interval-join rewrite.
  *
  * This is the (c)-tier extension mechanism from the design brief
  * (`SparkSessionExtensions`): `injectFunction` for the one genuinely
  * custom scalar kernel (every reference operator lowers to built-ins,
  * SURVEY §7), and `injectOptimizerRule` for
  * [[graft.plans.BandedIntervalJoinRule]] — a logical rewrite that turns
  * the naive time-range theta join into the scalable banded equi-join.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      VectorFunctions.dotBuilder))
    ext.injectFunction((
      FunctionIdentifier("edit_within1"),
      new ExpressionInfo(classOf[graft.functions.EditWithinOne].getName, "edit_within1"),
      graft.functions.StringFunctions.editWithin1Builder))
    ext.injectOptimizerRule(_ => graft.plans.BandedIntervalJoinRule)
    // whole-operator rung: plans graft.plans.SkylineNode → SkylineExec
    ext.injectPlannerStrategy(_ => graft.plans.SkylineStrategy)
  }
}
