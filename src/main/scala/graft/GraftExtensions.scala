package graft

import graft.functions.{DotProduct, VectorFunctions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: install the engine's native expressions
  * into every session on a cluster via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no driver code
  * required, SQL and DataFrame users both get `vec_dot`.
  *
  * This is the (c)-tier extension mechanism from the design brief
  * (`SparkSessionExtensions`); the engine needs only `injectFunction` —
  * every reference operator lowers to built-ins (SURVEY §7 "custom Catalyst
  * work needed: essentially none"), and the one genuinely custom kernel is
  * a scalar expression, not a plan node.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      VectorFunctions.dotBuilder))
  }
}
