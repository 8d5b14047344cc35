package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ClassicConversions, ColumnConversions}

/** Bridge into the sql package for the engine's custom Catalyst
  * expressions: Column <-> Expression conversion is `private[sql]` in
  * Spark 4's unified Column API, so the (stable, classic) converters
  * are re-exported here for graft.plans.
  */
object GraftColumnBridge {

  def column(e: Expression): Column =
    ClassicConversions.ColumnConstructorExt(Column).apply(e)

  def expression(c: Column): Expression =
    ColumnConversions.expression(c)

  /** Dataset.ofRows is private[sql]; the custom-operator API
    * (graft.plans.NativeAsOf) needs it to lift a hand-built
    * LogicalPlan into a DataFrame. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a DataFrame. */
  def analyzed(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Install a planner strategy session-locally (idempotent) via the
    * public ExperimentalMethods hook — the no-config alternative to
    * SparkSessionExtensions for ad-hoc sessions. */
  def installStrategy(
      spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
