package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` bridge the engine needs: wrap a hand-built
  * [[LogicalPlan]] (e.g. [[graft.plans.AsofJoinNode]]) into a DataFrame.
  * Living under `org.apache.spark.sql` grants access to
  * `Dataset.ofRows` — the standard technique used by Spark extension
  * libraries (Delta, Sedona, Iceberg) to introduce custom plan nodes,
  * since Spark exposes no public constructor for this. Nothing else in
  * the engine reaches into Spark internals through package location.
  */
object GraftSql {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
