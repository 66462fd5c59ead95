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

  /** Merge into a catalog table and swap (overwrite). `localCheckpoint`
    * materializes the merge and severs plan lineage — Spark (rightly)
    * refuses to overwrite a table its own plan still reads.
    */
  def mergeIntoTable(spark: SparkSession, table: String,
                     updates: DataFrame, key: Seq[String]): Long = {
    val staged = mergeByKey(spark.table(table), updates, key)
      .localCheckpoint(eager = true)
    val n = staged.count()
    staged.write.mode(SaveMode.Overwrite).saveAsTable(table)
    // drop the cached file index — readers resolved against the
    // pre-swap file listing would otherwise hit deleted parquet parts
    spark.catalog.refreshTable(table)
    n
  }
}
