package graft

import org.apache.spark.sql.functions._
import graft.operators.{Layout, Multimodal, Stats}
import graft.streaming.StreamOps

/** The banded perceptual-hash store: incremental media near-dup through
  * the manifest-pruned (w, wk)-clustered store must (a) answer
  * identically to the flat in-memory path, and (b) OPEN strictly fewer
  * store files than the store holds — the BandedStoreSpec accounting
  * applied to the media axis.
  */
class MediaStoreSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // deterministic 56-bit spread hashes — window keys scatter across
  // the (w, wk) range like real dHashes
  private def spread(i: Long): Long =
    (i * 0x9E3779B97F4A7C15L) & ((1L << 56) - 1)

  test("dhash banded store: pruned-store pairing ≡ flat pairing, and " +
      "the probe's store scan opens strictly fewer files than the " +
      "store holds") {
    import spark.implicits._
    val hist = (0L until 200L).map(i => (i, spread(i)))
      .toDF("media_id", "dhash")
    // probe: an exact re-upload of hist 7 plus a genuinely new hash
    val probe = Seq((1000L, spread(7L)), (1001L, spread(5000L)))
      .toDF("media_id", "dhash")
    val root = tmp("graft-dhstore-")
    val store = s"$root/store"
    val manifest = s"$root/manifest"
    Multimodal.writeDhashStore(hist, store, manifest, filesOut = 64)

    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b"), col("dist"))
        .as[(Long, Long, Int)].collect().toSet
    val stored = key(Multimodal.dhashPairsAgainstStored(store, manifest,
      probe, maxDist = 3))
    val flat = key(Multimodal.dhashPairsAgainst(hist, probe, maxDist = 3))
    assert(stored == flat, s"stored=$stored flat=$flat")
    assert(stored.exists { case (a, b, d) => a == 7L && b == 1000L &&
      d == 0 }, s"stored=$stored")

    val total = Layout.dataFileCount(spark, store)
    val touched = Seq((1000L, spread(7L)), (1001L, spread(5000L)))
      .toDF("media_id", "dhash")
    val kept = Stats.touchedPairsKeptFiles(spark, store, manifest,
      "w", "wk",
      // the probe's own window keys, via the store's public row shape
      Multimodal.dhashWindowRows(touched).select(col("w"), col("wk")))
    assert(total >= 32, s"store should be many files, got $total")
    assert(kept.size < total,
      s"pruning must drop files: kept ${kept.size} of $total")
  }

  // collision-free synthetic video: every 64-byte frame embeds
  // (seed, frame index) literally, so frames are equal IFF seed and
  // index agree — no cross-seed coincidences
  private def vid(seed: Int, frames: Int): Array[Byte] =
    Array.tabulate(64 * frames) { j =>
      (j % 64) match {
        case 0 => seed.toByte
        case 1 => (seed >> 8).toByte
        case 2 => (j / 64).toByte
        case _ => 0x5A.toByte
      }
    }

  test("video frame store: pruned-store pairing ≡ the batch twin " +
      "restricted to batch-side larger ids, and the probe opens " +
      "strictly fewer files than the store holds") {
    import spark.implicits._
    val hist = (0 until 50).map(i => (i.toLong, vid(i, 3)))
      .toDF("media_id", "payload")
    val batch = Seq((1000L, vid(7, 3)), (1001L, vid(999, 3)))
      .toDF("media_id", "payload")
    val root = tmp("graft-framestore-")
    val store = s"$root/store"
    val manifest = s"$root/manifest"
    Multimodal.writeFrameStore(hist, store, manifest, filesOut = 32)

    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b"), col("shared_frames"))
        .as[(Long, Long, Long)].collect().toSet
    val stored = key(Multimodal.videoFrameDupPairsAgainstStored(
      store, manifest, batch, frameBytes = 64, minShared = 2))
    val twin = key(Multimodal.videoFrameDupPairs(
        hist.unionByName(batch), frameBytes = 64, minShared = 2)
      .where(col("id_b") >= 1000L))
    assert(stored == twin && stored == Set((7L, 1000L, 3L)),
      s"stored=$stored twin=$twin")

    val total = Layout.dataFileCount(spark, store)
    val kept = Stats.touchedKeysKeptFiles(spark, store, manifest, "fh",
      Multimodal.videoFrameRows(batch, 64).select(col("fh")))
    assert(total >= 16, s"store should be many files, got $total")
    assert(kept.size < total,
      s"pruning must drop files: kept ${kept.size} of $total")
  }

  test("videoDedupGateSink: shared-frame gate drops cross- and intra-" +
      "batch dups through the fh-clustered store; empty payloads " +
      "survive unstored; compaction folds a generation") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = s"/tmp/graft-videogate-${System.nanoTime()}"
    val junk = Array.empty[Byte] // no bytes: no frames, dead-letter
    val in = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.videoDedupGateSink(spark,
      in.toDF().toDF("media_id", "payload"), "media_id", "payload",
      s"$base/store", s"$base/out", s"$base/ckpt",
      frameBytes = 64, minShared = 2, compactEvery = 2)
    try {
      in.addData((1L, vid(10, 3)), (2L, vid(20, 3)), (3L, junk))
      q.processAllAvailable()
      // 11 re-upload of 1's video -> dropped; 12 fresh
      in.addData((11L, vid(10, 3)), (12L, vid(30, 3)))
      q.processAllAvailable()
      // 21 dup of batch-2 survivor 12; 22/23 intra-batch pair
      // (smaller id 22 wins); 24 junk survives
      in.addData((21L, vid(30, 3)), (22L, vid(40, 3)),
        (23L, vid(40, 3)), (24L, junk))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select(col("media_id")).as[Long].collect().toSet
      assert(out == Set(1L, 2L, 3L, 12L, 22L, 24L), s"out: $out")
      // store holds 3 frame rows per hashable survivor, none for junk
      val store = StreamOps.gateStoreView(spark, s"$base/store",
        Seq("fh", "id")).get
      val ids = store.select(col("id")).distinct()
        .as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 12L, 22L), s"store ids: $ids")
      assert(store.count() == 4 * 3, s"rows: ${store.count()}")
      val fs = new org.apache.hadoop.fs.Path(s"$base/store")
        .getFileSystem(spark.sessionState.newHadoopConf())
      val dirNames = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$base/store"))
        .filter(_.isDirectory).map(_.getPath.getName).toSet
      assert(dirNames.exists(_.startsWith("gen=")), s"dirs: $dirNames")
    } finally q.stop()
  }

  test("gate-store retraction: media and video takedowns stop " +
      "suppressing re-uploads immediately; the owning gate's next " +
      "compaction drops the rows physically and clears the tombstone " +
      "set; suppression transfers to the re-upload") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = s"/tmp/graft-mediaret-${System.nanoTime()}"
    val (pa, pb) = (Multimodal.syntheticPng(0L),
      Multimodal.syntheticPng(4L))
    // IMAGE arm
    val min = MemoryStream[(Long, Array[Byte])]
    val mq = StreamOps.mediaDedupGateSinkBanded(spark,
      min.toDF().toDF("media_id", "payload"), "media_id", "payload",
      s"$base/m", s"$base/mout", s"$base/mckpt", compactEvery = 2)
    try {
      min.addData((1L, pa), (2L, pb)); mq.processAllAvailable()
    } finally mq.stop()
    // right-to-be-forgotten on image 1, under QUIESCE — batch
    // mutators are fenced against live gates, so the takedown runs
    // between sink generations and the gate resumes from checkpoint
    StreamOps.deleteFromNearDupStore(spark, s"$base/m",
      Seq(1L).toDF("id"), batchId = 1L)
    val mq2 = StreamOps.mediaDedupGateSinkBanded(spark,
      min.toDF().toDF("media_id", "payload"), "media_id", "payload",
      s"$base/m", s"$base/mout", s"$base/mckpt", compactEvery = 2)
    try {
      // a re-upload of the SAME image now survives (the retracted
      // windows stop suppressing), and this stream batch compacts:
      // physical drop + tombstone clear
      min.addData((11L, pa)); mq2.processAllAvailable()
      val mout = spark.read.parquet(s"$base/mout")
        .select(col("media_id")).as[Long].collect().toSet
      assert(mout == Set(1L, 2L, 11L), s"got $mout")
      val mIds = StreamOps.gateStoreView(spark, s"$base/m",
          Seq("id")).get.distinct().as[Long].collect().toSet
      assert(mIds == Set(2L, 11L), s"store ids $mIds")
      assert(spark.read.parquet(
          Stats.committedViewDirs(spark, s"$base/m_deleted"): _*)
        .isEmpty)
      // suppression TRANSFERRED: a third copy drops against 11
      min.addData((21L, pa)); mq2.processAllAvailable()
      val mout2 = spark.read.parquet(s"$base/mout")
        .select(col("media_id")).as[Long].collect().toSet
      assert(mout2 == Set(1L, 2L, 11L), s"got $mout2")
    } finally mq2.stop()
    // VIDEO arm
    val vin = MemoryStream[(Long, Array[Byte])]
    val vq = StreamOps.videoDedupGateSink(spark,
      vin.toDF().toDF("media_id", "payload"), "media_id", "payload",
      s"$base/v", s"$base/vout", s"$base/vckpt",
      frameBytes = 64, minShared = 2, compactEvery = 2)
    try {
      vin.addData((1L, vid(10, 3)), (2L, vid(20, 3)))
      vq.processAllAvailable()
    } finally vq.stop()
    StreamOps.deleteFromNearDupStore(spark, s"$base/v",
      Seq(1L).toDF("id"), batchId = 1L)
    val vq2 = StreamOps.videoDedupGateSink(spark,
      vin.toDF().toDF("media_id", "payload"), "media_id", "payload",
      s"$base/v", s"$base/vout", s"$base/vckpt",
      frameBytes = 64, minShared = 2, compactEvery = 2)
    try {
      vin.addData((11L, vid(10, 3))); vq2.processAllAvailable()
      val vout = spark.read.parquet(s"$base/vout")
        .select(col("media_id")).as[Long].collect().toSet
      assert(vout == Set(1L, 2L, 11L), s"got $vout")
      val vIds = StreamOps.gateStoreView(spark, s"$base/v",
          Seq("id")).get.distinct().as[Long].collect().toSet
      assert(vIds == Set(2L, 11L), s"store ids $vIds")
      assert(spark.read.parquet(
          Stats.committedViewDirs(spark, s"$base/v_deleted"): _*)
        .isEmpty)
    } finally vq2.stop()
  }

  test("mediaDedupGateSinkBanded: gate semantics match the flat media " +
      "gate across 3 batches, appends cluster + refresh the manifest, " +
      "compaction folds batches into a generation") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = s"/tmp/graft-mediabanded-${System.nanoTime()}"
    val (pa, pb, pc, pd) = (Multimodal.syntheticPng(0L),
      Multimodal.syntheticPng(4L), Multimodal.syntheticPng(5L),
      Multimodal.syntheticPng(6L))
    val junk = "not an image".getBytes
    val in = MemoryStream[(Long, Array[Byte])]
    val q = StreamOps.mediaDedupGateSinkBanded(spark,
      in.toDF().toDF("media_id", "payload"), "media_id", "payload",
      s"$base/store", s"$base/out", s"$base/ckpt",
      compactEvery = 2)
    try {
      in.addData((1L, pa), (2L, pb), (3L, junk))
      q.processAllAvailable()
      in.addData((11L, pa), (12L, pc)); q.processAllAvailable()
      in.addData((21L, pc), (22L, pd), (23L, pd), (24L, junk))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select(col("media_id")).as[Long].collect().toSet
      // same decisions as the flat gate's spec fixture: 11 re-crawl of
      // 1 dropped; 21 dup of survivor 12; 23 intra-batch dup of 22
      assert(out == Set(1L, 2L, 3L, 12L, 22L, 24L), s"out: $out")
      // store rows are window-expanded survivors: 4 windows per
      // hashable survivor, none for dead-letters — read via the
      // generation-aware committed view (the gate's own reader; the
      // root mixes gen=/batch= dirs during the vacuum grace cycle)
      val store = StreamOps.gateStoreView(spark, s"$base/store",
        Seq("w", "wk", "id", "dhash")).get
      val ids = store.select(col("id")).distinct()
        .as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 12L, 22L), s"store ids: $ids")
      assert(store.count() == 4 * 4, s"rows: ${store.count()}")
      // compactEvery = 2 folded batches 0-1 into gen=1 after batch 1
      val fs = new org.apache.hadoop.fs.Path(s"$base/store")
        .getFileSystem(spark.sessionState.newHadoopConf())
      val dirNames = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$base/store"))
        .filter(_.isDirectory).map(_.getPath.getName).toSet
      assert(dirNames.exists(_.startsWith("gen=")), s"dirs: $dirNames")
      // manifest exists and covers the store: pruning with an
      // impossible window key keeps no data files
      val none = Stats.touchedPairsKeptFilesUnder(spark,
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/store"))
          .filter(_.isDirectory).map(_.getPath.toString).toSeq,
        s"$base/store_manifest", "w", "wk",
        Seq((99L, 99L)).toDF("w", "wk"))
      val all = Stats.touchedPairsKeptFilesUnder(spark,
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/store"))
          .filter(_.isDirectory).map(_.getPath.toString).toSeq,
        s"$base/store_manifest", "w", "wk",
        store.select(col("w"), col("wk")))
      assert(none.size < all.size,
        s"manifest must prune: ${none.size} vs ${all.size}")
    } finally q.stop()
  }
}
