package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data-layout maintenance — the operational side of a 100 TB
  * table that query operators depend on but don't manage:
  *
  *  - **Small-file compaction.** Streaming/incremental appends produce
  *    files per micro-batch per partition; scans then pay a task per
  *    tiny file and the driver pays listing/footer costs. Compaction
  *    rewrites a table (or one partition of it) into ~target-sized
  *    files.
  *  - **Clustered rewrite.** Sorting each output file by high-
  *    selectivity columns tightens parquet row-group min/max ranges,
  *    so predicate pushdown skips whole row groups — the poor man's
  *    Z-order, and the right layout for time-range or key-range scans.
  *
  * Both are full rewrites of the affected partition only — pair with
  * partitioned tables so maintenance is incremental per partition.
  */
object Layout {

  /** Rewrite `sourceDir`'s parquet data into `destDir` as ~`filesOut`
    * files of row-count-balanced size, each internally sorted by
    * `clusterBy` (empty = no sort). Returns the rewritten row count.
    *
    * repartitionByRange on the cluster key (falls back to a plain
    * round-robin repartition when no key is given) + sortWithinPartitions
    * gives one task per output file with globally range-clustered,
    * locally sorted data — max row-group skipping on later scans.
    */
  def compact(spark: SparkSession, sourceDir: String, destDir: String,
              filesOut: Int, clusterBy: Seq[String] = Nil): Long = {
    val in = spark.read.parquet(sourceDir)
    val shaped =
      if (clusterBy.nonEmpty)
        in.repartitionByRange(filesOut, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else in.repartition(filesOut)
    // Row count observed ON the write job itself (Observation metrics
    // ride the task results) — a maintenance job must not pay a second
    // full scan of the data it just rewrote.
    val obs = org.apache.spark.sql.Observation()
    shaped.observe(obs, count(lit(1)).as("rows"))
      .write.mode(SaveMode.Overwrite).parquet(destDir)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Data-file count of a parquet directory (what a scan pays for). */
  def dataFileCount(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .count(f => f.getName.endsWith(".parquet") && f.length() > 0)
}
