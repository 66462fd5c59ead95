package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal}

/** The round-9 OOM-class guarantee: every bucket-membership aggregation
  * bounds its BUFFER, not just its pair expansion — over-cap buckets are
  * removed by a pre-count + semi join BEFORE any collect_list/collect_set
  * buffer forms — and the blocked Hamming pairing carries the same
  * opt-in skew cap on its (w, wk) window join.
  */
class BoundedBucketSpec extends SparkSuite {

  test("boundedBucketMembers: a planted over-cap bucket never reaches " +
      "the collect (semi join sits BELOW the aggregate in the physical " +
      "plan), small buckets aggregate normally") {
    import spark.implicits._
    // bucket "hot": 25 members (over cap 10); bucket "ok": 3; "solo": 1
    val rows = ((0 until 25).map(i => ("hot", i.toLong)) ++
      (100 until 103).map(i => ("ok", i.toLong)) ++
      Seq(("solo", 999L)))
      .toDF("k", "id")
    val members = Dedup.boundedBucketMembers(rows, Seq("k"),
      collect_list(col("id")), maxBucket = 10)
    val got = members.select(col("k"), col("ms")).as[(String, Seq[Long])]
      .collect().toMap
    assert(got.keySet == Set("ok"), s"keys: ${got.keySet}")
    assert(got("ok").sorted == Seq(100L, 101L, 102L))
    // structural guarantee: the cap is enforced by a semi join UNDER
    // the collect aggregate (plan prints top-down, so the aggregate
    // line precedes the join line) — a post-collect size filter would
    // show no semi join at all
    val p = members.queryExecution.executedPlan.toString()
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(p.indexOf("collect_list") >= 0 &&
      p.indexOf("collect_list") < p.indexOf("LeftSemi"), p.take(1500))
  }

  test("minhashCandidates: a 30-clone boilerplate bucket is skipped " +
      "whole (no clone pairs, no buffer), a genuine small dup group " +
      "still pairs") {
    import spark.implicits._
    val clones = (0L until 30L).map(i =>
      (i, "identical boilerplate footer text appearing everywhere"))
    val dups = Seq(
      (100L, "a unique document about spark partitioning strategies"),
      (101L, "a unique document about spark partitioning strategies"))
    val fresh = Seq((200L, "completely unrelated content tail xyz"))
    val docs = (clones ++ dups ++ fresh).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(
        Dedup.minhashSigsNative(docs, col("doc_id"), col("text")),
        maxBucket = 10)
      .where(col("est_jaccard") >= 0.8)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)), s"pairs: $pairs")
  }

  test("dhashPairs maxBucket: degenerate window keys (the perceptual-" +
      "hash stop-shingle) are skipped before the join; pairs blocked " +
      "only by healthy windows survive") {
    import spark.implicits._
    // ids 1..20: dhash = id << 14 — windows w0/w2/w3 all collapse to
    // key 0 (20 members, degenerate), w1 keys are all distinct. With
    // cap 10 no window pairs them. ids 100/101 share a private dhash:
    // every window key has exactly 2 members — survives the cap.
    val hashes = ((1L to 20L).map(i => (i, i << 14)) ++
      Seq((100L, 0x00ABCD1234567L), (101L, 0x00ABCD1234567L)))
      .toDF("media_id", "dhash")
    val uncapped = Multimodal.dhashPairs(hashes, maxDist = 3)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((100L, 101L)),
      s"uncapped: $uncapped")
    val capped = Multimodal.dhashPairs(hashes, maxDist = 3,
        maxBucket = 10)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(capped == Set((100L, 101L)), s"capped: $capped")
  }

  test("dhashPairsAgainst maxBucket: the cap counts over the combined " +
      "store+probe side, so a window degenerate only in combination " +
      "is still skipped") {
    import spark.implicits._
    // store: 8 ids with dhash i<<14, probe: 8 with dhash (i+8)<<14 —
    // all 16 share window key 0 on w0/w2/w3 (each side alone under
    // cap 12, together 16), while every w1 key is a singleton. Probe
    // also carries a private exact dup of a store row far from the
    // degenerate family.
    val store = ((1L to 8L).map(i => (i, i << 14)) ++
      Seq((50L, 0x00ABCD1234567L))).toDF("media_id", "dhash")
    val probe = ((101L to 108L).map(i => (i, (i - 92L) << 14)) ++
      Seq((150L, 0x00ABCD1234567L))).toDF("media_id", "dhash")
    val capped = Multimodal.dhashPairsAgainst(store, probe, maxDist = 3,
        maxBucket = 12)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(capped == Set((50L, 150L)), s"capped: $capped")
    val uncapped = Multimodal.dhashPairsAgainst(store, probe, maxDist = 3)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 101L)) && uncapped((50L, 150L)),
      s"uncapped: $uncapped")
  }

  test("videoFrameDupPairs: a frame shared by every video (constant " +
      "container prefix planted over cap) forms no buffer and no " +
      "pairs; genuinely shared content still pairs") {
    import spark.implicits._
    val common = Array.fill(64)(0x5A.toByte) // one boilerplate frame
    def vid(seed: Int, frames: Int): Array[Byte] =
      common ++ Array.tabulate(64 * frames)(j =>
        ((seed * 31 + j) % 251).toByte)
    // 12 videos all share ONLY the boilerplate frame (cap 8 skips it);
    // 100/101 share 4 real content frames
    val media = ((1 to 12).map(i => (i.toLong, vid(i, 3))) ++
      Seq((100L, vid(77, 4)), (101L, vid(77, 4))))
      .toDF("media_id", "payload")
    val pairs = Multimodal.videoFrameDupPairs(media, frameBytes = 64,
        minShared = 2, maxBucket = 8)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 101L)), s"pairs: $pairs")
  }

  test("decodeAudioFingerprint dead-letters 16-bit NON-PCM WAVs (IEEE " +
      "float tag): the fmt audioFormat gate") {
    val pcm = Multimodal.syntheticWav(42L)
    assert(Multimodal.decodeAudioFingerprint(pcm).nonEmpty)
    // same container, audioFormat patched to 3 (IEEE float): the
    // samples are no longer integer PCM and must not fingerprint
    val ieee = pcm.clone()
    ieee(20) = 3.toByte // fmt chunk data starts at 20; format tag LE
    ieee(21) = 0.toByte
    assert(Multimodal.decodeAudioFingerprint(ieee).isEmpty)
  }

  test("mediaDedupGateSink aliases the payload column: a stream whose " +
      "payload column is NOT named 'payload' still gates") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = s"/tmp/graft-mediagate-alias-${System.nanoTime()}"
    val in = MemoryStream[(Long, Array[Byte])]
    val q = StreamOpsAliasAccess.gate(spark,
      in.toDF().toDF("media_id", "bytes"), base)
    try {
      in.addData((1L, Multimodal.syntheticPng(0L)))
      q.processAllAvailable()
      in.addData((11L, Multimodal.syntheticPng(0L)),
        (12L, Multimodal.syntheticPng(4L)))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select(col("media_id")).as[Long].collect().toSet
      assert(out == Set(1L, 12L), s"out: $out")
    } finally q.stop()
  }
}

/** Indirection so the spec reads clean: the gate under its non-default
  * payload column name, with the skew cap wired through.
  */
object StreamOpsAliasAccess {
  def gate(spark: org.apache.spark.sql.SparkSession,
           stream: org.apache.spark.sql.DataFrame, base: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.streaming.StreamOps.mediaDedupGateSink(spark, stream,
      "media_id", "bytes", s"$base/store", s"$base/out", s"$base/ckpt",
      maxDist = 3, maxBucket = 1000)
}
