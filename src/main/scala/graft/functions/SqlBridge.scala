package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters —
  * the standard hook point for Spark-native extension libraries that
  * define custom Catalyst expressions (Spark 4 moved classic Column
  * internals behind org.apache.spark.sql.classic).
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def logicalPlan(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
  def ofRows(spark: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** Idempotently add a planner strategy to a live session (the
    * config-time path is SparkSessionExtensions / GraftExtensions). */
  def ensureStrategy(spark: SparkSession,
                     s: execution.SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
  }

  /** Release the cached blocks behind a `localCheckpoint()`ed Dataset.
    * Iterative operators checkpoint per round to truncate lineage; the
    * superseded rounds' blocks must be freed or a long job leaks the
    * block manager full (localCheckpoint caches the RDD directly, so
    * `Dataset.unpersist` — which only consults the CacheManager — can't
    * release it).
    */
  def freeLocalCheckpoint(df: Dataset[_]): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.foreach {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ =>
    }
}
