package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one sanctioned crossing of the `private[sql]` boundary: building a
  * DataFrame from a custom [[LogicalPlan]] node (`Dataset.ofRows`) is how
  * every out-of-tree operator library (Delta, Iceberg, Sedona, …) injects
  * whole-operator plans, and Spark exposes no public equivalent. Kept to
  * exactly two forwarders so the internal surface the engine depends on is
  * auditable in one file.
  */
object PlanHooks {

  /** DataFrame over an arbitrary logical plan (analyzer runs as usual). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The ANALYZED plan of `df` — resolved attributes, stable for embedding
    * as a custom node's child. */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
