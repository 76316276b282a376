package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** Minimal `private[sql]` bridge (the standard extension-library
  * technique: a nested `org.apache.spark.sql` package object grants
  * access to `Dataset.ofRows`, which is how a library turns a custom
  * [[LogicalPlan]] node into a user-facing DataFrame). Nothing else
  * from the internal surface is exposed.
  */
object Bridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)
}
