package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE/upsert semantics over plain Parquet tables — the incremental-
  * load primitive a pipeline needs without a lakehouse format: new rows
  * win by key, untouched rows carry over.
  *
  * Shape: `updates ∪ (target ⟕̸ updates)` — one anti join on the key (a
  * broadcast when the update batch is small, which is the common
  * incremental case) plus a union; no full-table window or sort. The
  * rewrite-and-swap write is idempotent: re-running the same merge
  * produces the same table (O6 semantics, SURVEY.md §2.4).
  */
object Upsert {

  /** Pure merge: rows of `updates` plus rows of `target` whose key has
    * no update. Schemas must match.
    */
  def mergeByKey(target: DataFrame, updates: DataFrame,
                 key: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    require(updates.columns.toSeq == cols,
      s"schema mismatch: $cols vs ${updates.columns.toSeq}")
    val untouched = target.join(broadcast(updates.select(key.map(col): _*)),
      key, "left_anti")
    updates.unionByName(untouched)
  }

  /** Type-2 slowly-changing-dimension merge: history-preserving upsert.
    * `target` carries the dimension plus SCD bookkeeping columns
    * (`valid_from`, `valid_to`, `is_current`); `updates` carries the
    * bare business columns. For keys whose tracked attributes changed,
    * the current row is CLOSED (`valid_to` = effective, `is_current` =
    * false) and a new current row opens at `effective`; unchanged keys
    * and prior history pass through untouched; brand-new keys open
    * their first row. A closed-world `endOfTime` sentinel (not NULL)
    * keeps `valid_to` totally ordered — BETWEEN probes need no null
    * branch.
    *
    * Shape: the update batch (small, the incremental case) drives
    * everything — change detection is one join of updates against
    * current rows, and the changed-key set applies back to the target
    * via broadcast semi/anti joins. The 100 TB dimension is never
    * shuffled: every wide op keys on the broadcast changed-key set.
    * Null-safe change test (`<=>` over a struct of tracked columns), so
    * NULL→value transitions version correctly.
    */
  def scd2Merge(target: DataFrame, updates: DataFrame, key: Seq[String],
                track: Seq[String], effective: Column,
                endOfTime: Column): DataFrame = {
    val biz = updates.columns.toSeq
    require(key.forall(biz.contains), s"key $key not in update columns")
    require(track.forall(biz.contains), s"track $track not in updates")
    val cur = target.where(col("is_current"))
    val trackStruct = (side: String) =>
      struct(track.map(c => col(s"$side.$c")): _*)
    val changed = updates.alias("u")
      .join(cur.alias("t"), key)
      .where(!(trackStruct("u") <=> trackStruct("t")))
      .select(biz.map(c => col(s"u.$c")): _*)
    val changedKeys = changed.select(key.map(col): _*).distinct()
    val closed = cur
      .join(broadcast(changedKeys), key, "left_semi")
      .withColumn("valid_to", effective)
      .withColumn("is_current", lit(false))
    val opened = changed
      .withColumn("valid_from", effective)
      .withColumn("valid_to", endOfTime)
      .withColumn("is_current", lit(true))
    // New-key probe: the lookup set is the (large) dimension itself, so
    // no broadcast hint — the planner shuffles the small update batch
    // against it, and a Layout.writeBucketed dimension makes this anti
    // join shuffle-free on the dimension side entirely.
    val firstSeen = updates
      .join(target.select(key.map(col): _*).distinct(), key, "left_anti")
      .withColumn("valid_from", effective)
      .withColumn("valid_to", endOfTime)
      .withColumn("is_current", lit(true))
    target.where(!col("is_current"))
      .unionByName(cur.join(broadcast(changedKeys), key, "left_anti"))
      .unionByName(closed)
      .unionByName(opened)
      .unionByName(firstSeen)
  }

  /** Merge into a catalog table and swap (overwrite). `localCheckpoint`
    * materializes the merge and severs plan lineage — Spark (rightly)
    * refuses to overwrite a table its own plan still reads.
    */
  def mergeIntoTable(spark: SparkSession, table: String,
                     updates: DataFrame, key: Seq[String]): Long = {
    val obs = new org.apache.spark.sql.Observation()
    val staged = mergeByKey(spark.table(table), updates, key)
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .localCheckpoint(eager = true)
    val n = obs.get("n").asInstanceOf[Long]
    staged.write.mode(SaveMode.Overwrite).saveAsTable(table)
    // drop the cached file index — readers resolved against the
    // pre-swap file listing would otherwise hit deleted parquet parts
    spark.catalog.refreshTable(table)
    n
  }
}
