package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` — the only way to wrap a custom [[LogicalPlan]]
  * node back into a DataFrame — is `private[sql]` on the Spark 4
  * classic Dataset. Re-exported here (the [[ColumnBridge]] shim
  * discipline) for graft's custom whole-operator plans. */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
