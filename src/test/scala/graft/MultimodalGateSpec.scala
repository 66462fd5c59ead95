package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Stats}
import graft.streaming.StreamOps

/** The unified cross-modal streaming gate: one stream carrying all
  * four modality payloads, gated against four persisted stores at
  * once — a doc falls to whichever arm links it to history or a
  * smaller-id batch sibling, and dead-letter payloads survive
  * unstored per arm.
  */
class MultimodalGateSpec extends SparkSuite {
  import spark.implicits._

  private val textA =
    "the quick brown fox jumps over the lazy dog again and again"
  private def soup(i: Int): String =
    s"wholly distinct vocabulary number$i carries unique tokens " +
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"

  test("multimodalGateSink: each arm drops its modality's dups across " +
      "and within batches; dead-letters survive unstored; stores are " +
      "banded, manifest-pruned, and hold only survivors") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = s"/tmp/graft-mmgate-${System.nanoTime()}"
    def png(i: Long) = Multimodal.syntheticPng(i)
    def wav(i: Long) = Multimodal.syntheticWav(i)
    def mp4(i: Long) = Multimodal.syntheticMp4(i)
    val junkImg = "not an image".getBytes
    val junkWav = "RIFFbut-truncated".getBytes
    val in = MemoryStream[(Long, String, Array[Byte], Array[Byte],
      Array[Byte])]
    val q = StreamOps.multimodalGateSink(spark,
      in.toDF().toDF("media_id", "text", "img", "aud", "vid"),
      "media_id", "text", "img", "aud", "vid",
      s"$base/stores", s"$base/out", s"$base/ckpt",
      compactEvery = 2)
    try {
      in.addData(
        (1L, textA, png(1), wav(0), mp4(1)),
        (2L, soup(2), png(4), wav(5), mp4(2)))
      q.processAllAvailable()
      in.addData(
        (11L, textA, png(7), wav(10), mp4(3)), // text dup of 1
        (12L, soup(12), png(1), wav(15), mp4(4)), // image dup of 1
        (13L, soup(13), png(13), wav(20), mp4(5))) // clean
      q.processAllAvailable()
      in.addData(
        (21L, soup(21), png(13), wav(0), mp4(6)), // audio dup of 1
        (22L, soup(22), png(16), wav(25), mp4(1)), // video dup of 1
        (23L, soup(23), junkImg, junkWav, mp4(7)), // dead-letters, clean
        (24L, soup(24), png(13), wav(30), mp4(8)), // image dup of 13
        (25L, soup(25), png(19), wav(35), mp4(9)), // clean
        (26L, soup(25), png(22), wav(40), mp4(10))) // text dup of 25
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select(col("mid")).as[Long].collect().toSet
      assert(out == Set(1L, 2L, 13L, 23L, 25L), s"out: $out")
      def storeIds(sub: String, cols: Seq[String]): Set[Long] =
        StreamOps.gateStoreView(spark, s"$base/stores/$sub", cols)
          .map(_.select(col("id")).distinct().as[Long].collect().toSet)
          .getOrElse(Set.empty)
      val sigCols = Seq("band", "bucket", "id", "sig")
      val dhCols = Seq("w", "wk", "id", "dhash")
      assert(storeIds("text", sigCols) == Set(1L, 2L, 13L, 23L, 25L))
      // 23's junk image/audio dead-letter: survives but stores nothing
      assert(storeIds("img", dhCols) == Set(1L, 2L, 13L, 25L))
      assert(storeIds("aud", dhCols) == Set(1L, 2L, 13L, 25L))
      assert(storeIds("vid", Seq("fh", "id")) ==
        Set(1L, 2L, 13L, 23L, 25L))
      // compaction folded early batches into a generation
      val fs = new org.apache.hadoop.fs.Path(s"$base/stores/text")
        .getFileSystem(spark.sessionState.newHadoopConf())
      val dirNames = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$base/stores/text"))
        .filter(_.isDirectory).map(_.getPath.getName).toSet
      assert(dirNames.exists(_.startsWith("gen=")), s"dirs: $dirNames")
      // the text manifest prunes: an impossible (band, bucket) probe
      // opens strictly fewer files than the store's own keys do
      val textDirs = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$base/stores/text"))
        .filter(_.isDirectory).map(_.getPath.toString).toSeq
      val none = Stats.touchedPairsKeptFilesUnder(spark, textDirs,
        s"$base/stores/text_manifest", "band", "bucket",
        Seq((Long.MaxValue, Long.MaxValue)).toDF("band", "bucket"))
      val store = StreamOps.gateStoreView(spark, s"$base/stores/text",
        sigCols).get
      val all = Stats.touchedPairsKeptFilesUnder(spark, textDirs,
        s"$base/stores/text_manifest", "band", "bucket",
        store.select(col("band"), col("bucket")))
      assert(none.size < all.size,
        s"manifest must prune: ${none.size} vs ${all.size}")
    } finally q.stop()
  }

  test("multimodal retraction: one takedown tombstones all FOUR arm " +
      "stores via retractionGateSink's gateStorePaths; every arm " +
      "stops suppressing immediately; the gate's own compaction " +
      "drops the rows physically and clears each set") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = s"/tmp/graft-mmret-${System.nanoTime()}"
    def png(i: Long) = Multimodal.syntheticPng(i)
    def wav(i: Long) = Multimodal.syntheticWav(i)
    def mp4(i: Long) = Multimodal.syntheticMp4(i)
    val in = MemoryStream[(Long, String, Array[Byte], Array[Byte],
      Array[Byte])]
    // the gate and the retraction sink share the four arm stores —
    // the writer fence forbids them live concurrently, so the gate is
    // QUIESCED around the takedown and resumes from its checkpoint
    def startGate() = StreamOps.multimodalGateSink(spark,
      in.toDF().toDF("media_id", "text", "img", "aud", "vid"),
      "media_id", "text", "img", "aud", "vid",
      s"$base/stores", s"$base/out", s"$base/ckpt",
      compactEvery = 2)
    val arms = Seq(s"$base/stores/text", s"$base/stores/img",
      s"$base/stores/aud", s"$base/stores/vid")
    val q1 = startGate()
    try {
      in.addData(
        (1L, textA, png(1), wav(0), mp4(1)),
        (2L, soup(2), png(4), wav(5), mp4(2)))
      q1.processAllAvailable()
    } finally q1.stop()
    // takedown of doc 1 fans into all four arm stores' sets
    val din = MemoryStream[Long]
    val dq = StreamOps.retractionGateSink(spark,
      din.toDF().toDF("id"), "id", None, None, s"$base/dckpt",
      gateStorePaths = arms)
    try {
      din.addData(1L); dq.processAllAvailable()
    } finally dq.stop()
    val q = startGate() // sequential resume above the takedown
    try {
      arms.foreach { p =>
        val del = spark.read.parquet(
            Stats.committedViewDirs(spark, s"${p}_deleted"): _*)
          .select(col("id")).as[Long].collect().toSet
        assert(del == Set(1L), s"$p deleted=$del")
      }
      // duplicates of doc 1 in EVERY modality now survive (they would
      // each have dropped to an arm before the takedown); this stream
      // batch also compacts all four stores: physical drop + clears
      in.addData(
        (11L, textA, png(7), wav(10), mp4(3)), // text twin of 1
        (12L, soup(12), png(1), wav(15), mp4(4)), // image twin of 1
        (13L, soup(13), png(13), wav(0), mp4(5)), // audio twin of 1
        (14L, soup(14), png(16), wav(20), mp4(1))) // video twin of 1
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select(col("mid")).as[Long].collect().toSet
      assert(out == Set(1L, 2L, 11L, 12L, 13L, 14L), s"out: $out")
      // physical drop: no arm's committed view holds id 1 anymore,
      // and every tombstone set cleared with its arm's fold
      def storeIds(sub: String, cols: Seq[String]): Set[Long] =
        StreamOps.gateStoreView(spark, s"$base/stores/$sub", cols)
          .map(_.select(col("id")).distinct().as[Long].collect().toSet)
          .getOrElse(Set.empty)
      assert(!storeIds("text", Seq("band", "bucket", "id", "sig"))
        .contains(1L))
      assert(!storeIds("img", Seq("w", "wk", "id", "dhash"))
        .contains(1L))
      assert(!storeIds("aud", Seq("w", "wk", "id", "dhash"))
        .contains(1L))
      assert(!storeIds("vid", Seq("fh", "id")).contains(1L))
      arms.foreach { p =>
        assert(spark.read.parquet(
            Stats.committedViewDirs(spark, s"${p}_deleted"): _*)
          .isEmpty, s"$p tombstones must clear at compaction")
      }
    } finally q.stop()
  }

  test("multimodalGateSink: a doc dropped by one arm stores NO " +
      "artifacts in any arm, and its later exact twin is admitted " +
      "only if some retained doc still evidences it") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = s"/tmp/graft-mmgate2-${System.nanoTime()}"
    val in = MemoryStream[(Long, String, Array[Byte], Array[Byte],
      Array[Byte])]
    val q = StreamOps.multimodalGateSink(spark,
      in.toDF().toDF("media_id", "text", "img", "aud", "vid"),
      "media_id", "text", "img", "aud", "vid",
      s"$base/stores", s"$base/out", s"$base/ckpt")
    try {
      in.addData((1L, textA, Multimodal.syntheticPng(1),
        Multimodal.syntheticWav(0), Multimodal.syntheticMp4(1)))
      q.processAllAvailable()
      // 11 drops via text (dup of 1) — its unique image is NOT stored
      in.addData((11L, textA, Multimodal.syntheticPng(40),
        Multimodal.syntheticWav(45), Multimodal.syntheticMp4(40)))
      q.processAllAvailable()
      // 21 carries ONLY 11's image: no retained doc evidences it →
      // admitted (the documented chain-blind stance; offline
      // reconciliation owns transitive chains)
      in.addData((21L, "completely different prose about sailing boats",
        Multimodal.syntheticPng(40), Multimodal.syntheticWav(50),
        Multimodal.syntheticMp4(41)))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select(col("mid")).as[Long].collect().toSet
      assert(out == Set(1L, 21L), s"out: $out")
    } finally q.stop()
  }
}
