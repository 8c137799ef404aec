package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's `private[sql] Dataset.ofRows` so a custom
  * `LogicalPlan` node can be wrapped back into the public DataFrame
  * API — the standard pattern extension libraries use (a nested
  * package of `org.apache.spark.sql` satisfies the access scope).
  * Spark 4 keeps the concrete implementation in `sql.classic`; every
  * local session IS a classic session. Nothing else of Spark's
  * internals is exposed. */
object SqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
