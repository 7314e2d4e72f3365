// Lives in org.apache.spark.sql ONLY to reach the package-private
// Dataset.ofRows — the standard testing-library trick for turning a
// LogicalPlan subtree back into a DataFrame. Used by the dev diagnostic
// graft.tools.PlanProbe to count the rows feeding a global window; no
// engine code path depends on this.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset, SparkSession => CSparkSession}

object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
}
