package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal accessor for the package-private `Dataset.ofRows` — the
  * standard bridge a Spark extension library needs to hand a custom
  * LogicalPlan (here: graft.plans.AsOfJoinNode) back to the user as a
  * DataFrame. This is the only file in the repo living outside the
  * `graft` namespace, and it contains no logic of its own.
  */
object GraftSqlBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
