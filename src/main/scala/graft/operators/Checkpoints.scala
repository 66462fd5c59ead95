package graft.operators

import org.apache.spark.sql.DataFrame

/** Stage materialization for multi-pass operators (the measured regime
  * gates, prefix-sum phases, and incremental near-dup batch sides all
  * materialize a batch-sized intermediate and reuse it across several
  * downstream jobs).
  *
  * Policy — the same one [[Graph]]'s iterative rounds use: with a
  * checkpoint directory set (`sparkContext.setCheckpointDir`, the
  * cluster posture) the stage is a RELIABLE `checkpoint()`, so a
  * 10-hour backfill batch survives executor loss mid-join instead of
  * recomputing the lineage from the source; without one it is the fast
  * executor-local `localCheckpoint()` (single-process runs, tests).
  *
  * Retention: Spark does NOT delete reliable checkpoint data on its
  * own — each stage leaves one rdd-* dir under the checkpoint dir.
  * One-shot batch jobs drop the dir when they finish (the
  * CheckpointModeSpec pattern). LONG-LIVED apps that set a checkpoint
  * dir must either enable
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (Spark then
  * deletes a stage's files once its RDD is garbage-collected) or
  * accept per-call accumulation; a per-micro-batch caller (the
  * streaming near-dup gate) that wants neither should simply leave the
  * checkpoint dir unset — micro-batches are retried whole by the
  * stream runner, so executor-loss recovery does not need reliable
  * stages there.
  */
private[graft] object Checkpoints {
  def stage(df: DataFrame): DataFrame =
    // partitioning-preserving: under AQE a plain Dataset.checkpoint
    // forgets the materialized layout (AdaptiveSparkPlanExec reports
    // UnknownPartitioning), so every staged-then-reused frame forced
    // downstream re-exchanges of rows already partitioned correctly —
    // the bridge re-attaches the final plan's true partitioning
    org.apache.spark.sql.GraftSqlBridge.stagePreservingPartitioning(
      df,
      reliable =
        df.sparkSession.sparkContext.getCheckpointDir.isDefined)

  /** [[stage]] + row count in ONE action: the count rides the staging
    * job as an [[org.apache.spark.sql.Observation]] instead of a
    * second job. In iterative operators the convergence/regime checks
    * are per-job scheduling latency, not data — fusing them halves
    * the job count of every round that stages anyway (and at cluster
    * scale saves one full pass over the staged rows per round).
    */
  def stageCount(df: DataFrame): (DataFrame, Long) = {
    val obs = org.apache.spark.sql.Observation()
    val st = stage(df.observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n")))
    (st, obs.get("n").asInstanceOf[Long])
  }

  /** RDD ids of stages that must SURVIVE cross-query block cleanup —
    * per-data-dir memoized artifacts reused across bench reruns.
    * Everything else a query stages is transient: the harness frees
    * un-pinned persistent RDDs between queries, or thousands of
    * localCheckpoint blocks accumulate over a full bench window and
    * the storage-memory pressure lands on whichever query runs near
    * the cliff (the r9 driver-window x_dedup_near 8× mystery).
    */
  private val pinnedSet =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** [[stage]], registered to survive [[freeTransient]]. */
  def stagePinned(df: DataFrame): DataFrame = {
    val s = stage(df)
    org.apache.spark.sql.GraftSqlBridge.checkpointRddIds(s)
      .foreach(id => pinnedSet.add(id): Unit)
    s
  }

  /** Unpersist every persistent RDD except the pinned stages — the
    * between-queries hygiene call of the bench/verify harnesses.
    * Blocks already gone are a no-op; reliable-checkpoint files are
    * left alone (only block-manager storage is released).
    */
  def freeTransient(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinnedSet.contains(id)) rdd.unpersist(blocking = false)
    }
}
