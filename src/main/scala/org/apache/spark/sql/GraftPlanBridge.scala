package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` constructors for the engine's custom
  * logical plans (SURVEY.md §7.4 tier (c): LogicalPlan + Strategy +
  * SparkPlan). Lives in the `org.apache.spark.sql` package purely for
  * ACCESS — it contains no Spark code, only two one-line delegations:
  * wrapping a custom [[LogicalPlan]] in a DataFrame (the same door the
  * built-in DSL goes through, so the plan runs the full analyzer →
  * optimizer → planner pipeline), and registering an extra planner
  * strategy on a live session.
  */
object GraftPlanBridge {

  /** DataFrame over an arbitrary (possibly unresolved) logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame (classic access path). */
  def logical(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.logical

  /** Idempotently append a planner strategy to the session. */
  def addStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
