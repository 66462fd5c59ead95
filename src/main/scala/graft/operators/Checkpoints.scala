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
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
