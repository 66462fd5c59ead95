package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats
import graft.streaming.StreamOps

/** The FS-metadata store-health console: compaction debt, sequence
  * head, and view size per root — the read-only inputs an
  * OPTIMIZE/vacuum scheduler acts on. Must never read data rows and
  * must track the store protocol exactly (committed dirs only;
  * folded batches stop counting as debt; tombstone sequences are
  * separate roots).
  */
class StoreStatsSpec extends SparkSuite {
  import spark.implicits._

  test("storeStats: debt counts committed batch dirs above the head, " +
      "compaction folds it to zero, tombstone sequences report " +
      "separately, and a missing root is empty — all without " +
      "touching data rows") {
    val base = s"/tmp/graft-storestats-${System.nanoTime()}"
    val store = s"$base/store"
    def stats() = Stats.storeStats(spark, Seq(store)).head
    // missing root
    assert(stats() == Stats.StoreStats(store, Long.MinValue,
      Long.MinValue, 0, 0, 0L))
    // three appended batches, no generation: debt = 3
    (0L to 2L).foreach { b =>
      Seq((b, s"s$b", b)).toDF("id", "sig", "__b")
        .coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$store/batch=$b")
    }
    val appended = stats()
    assert(appended.newestGen == Long.MinValue &&
      appended.newestBatch == 2L &&
      appended.batchDirsAboveGen == 3 &&
      appended.viewFiles >= 3 && appended.viewBytes > 0L,
      appended.toString)
    // an UNCOMMITTED dir (no _SUCCESS) is invisible — not debt
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$store/batch=9"))
    assert(stats().batchDirsAboveGen == 3)
    // compaction: debt drops to zero, the head advances to gen=2
    assert(StreamOps.compactNearDupStore(spark, store, 1)
      .contains(2L))
    val compacted = stats()
    assert(compacted.newestGen == 2L &&
      compacted.batchDirsAboveGen == 0, compacted.toString)
    // the one-cycle vacuum grace keeps folded dirs on disk, but they
    // are BELOW the head — still zero debt, and the view is gen-only
    assert(compacted.viewFiles == 1, compacted.toString)
    // tombstones are their own sequence, visible when asked for
    StreamOps.deleteFromNearDupStore(spark, store,
      Seq(1L).toDF("id"), batchId = 3L)
    val Seq(main, tomb) = Stats.storeStats(spark,
      Seq(store, s"${store}_deleted"))
    assert(main.batchDirsAboveGen == 0 &&
      tomb.newestBatch == 3L && tomb.batchDirsAboveGen == 1 &&
      tomb.viewBytes > 0L, s"$main / $tomb")
  }
}
