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

  /** Task-side access to the session's Hadoop configuration: wraps it
    * in Spark's (private[spark]) SerializableConfiguration and
    * broadcasts once — the returned thunk is a small serializable
    * closure executors can call per partition. Without this, task-side
    * `new Configuration()` would drop the session's object-store
    * credentials and site overrides.
    */
  def hadoopConfAccessor(spark: SparkSession)
      : () => org.apache.hadoop.conf.Configuration = {
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.asInstanceOf[classic.SparkSession].sessionState
          .newHadoopConf()))
    () => bc.value.value
  }

  /** Release the storage behind a checkpointed Dataset (local OR
    * reliable). Iterative operators checkpoint per round to truncate
    * lineage; the superseded rounds must be freed or a long job leaks —
    * cached blocks fill the block manager (localCheckpoint caches the
    * RDD directly, so `Dataset.unpersist` — which only consults the
    * CacheManager — can't release it), and reliable checkpoints
    * accumulate one copy of the working set on DFS per round (the
    * PeriodicCheckpointer problem; its fix — delete superseded
    * checkpoint files — applied here).
    */
  /** RDD ids of the checkpoint(s) backing a staged Dataset — the
    * handle the bench harness uses to PIN memoized cross-query
    * artifacts while freeing everything else between queries.
    */
  def checkpointRddIds(df: Dataset[_]): Seq[Int] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.collect {
      case l: execution.LogicalRDD => l.rdd.id
    }

  def freeLocalCheckpoint(df: Dataset[_]): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed.foreach {
      case l: execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
        l.rdd.getCheckpointFile.foreach { p =>
          try {
            val path = new org.apache.hadoop.fs.Path(p)
            path.getFileSystem(
              df.sparkSession.sparkContext.hadoopConfiguration)
              .delete(path, true): Unit
          } catch { case _: java.io.IOException => } // best-effort
        }
      case _ =>
    }
}
