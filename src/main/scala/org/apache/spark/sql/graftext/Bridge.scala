package org.apache.spark.sql.graftext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft's custom plan nodes need: turning
  * a hand-built [[LogicalPlan]] back into a user-facing [[DataFrame]].
  * Spark exposes every other extension point publicly
  * (`SparkSessionExtensions`, `experimental.extraStrategies`) but keeps
  * `Dataset.ofRows` package-private, so every plan-level extension library
  * ships exactly this bridge — a sub-package of `org.apache.spark.sql`
  * sees `private[sql]` members. Nothing else in graft lives outside the
  * `graft` namespace.
  */
object Bridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
