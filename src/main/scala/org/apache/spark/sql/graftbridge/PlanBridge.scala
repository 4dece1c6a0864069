package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset,
  SparkSession => ClassicSparkSession}

/** LogicalPlan ↔ DataFrame bridge. `Dataset.ofRows` is `private[sql]`
  * in Spark 4, so — like [[ColumnBridge]] — this shim lives under
  * `org.apache.spark.sql`, the standard pattern for extension libraries
  * that introduce their own logical plan nodes.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** `AtomicType` itself is `protected[sql]` in Spark 4; expose the
    * instance check for extension nodes that must restrict key types
    * (e.g. the as-of join's merge-copy contract).
    */
  def isAtomic(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt.isInstanceOf[org.apache.spark.sql.types.AtomicType]
}
