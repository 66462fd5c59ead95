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
  * One-shot stages supersede nothing, so there is nothing to vacuum
  * mid-operator; reliable checkpoint files live under the caller's
  * checkpoint dir and follow its retention.
  */
private[graft] object Checkpoints {
  def stage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
