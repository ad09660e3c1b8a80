package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access bridge for `Dataset.ofRows` — the internal-but-stable seam
  * Spark ecosystem libraries (GraphFrames and friends) use to surface
  * a custom LogicalPlan as a DataFrame. Lives in the
  * `org.apache.spark.sql` package solely to satisfy the
  * `private[sql]` qualifier; no Spark internals are modified.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
