package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis}
import graft.queries.ExtensionQueries

class TextMultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("fingerprint matches a reference polynomial implementation") {
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    val df = Seq((1L, "hello world"), (2L, ""), (3L, "a")).toDF("doc_id", "text")
    val got = df.select($"doc_id",
      TextAnalysis.fingerprint($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == ref("hello world"))
    assert(got(2L) == 0L)
    assert(got(3L) == 'a'.toLong)
  }

  test("quality: stopword ratio and gate behave") {
    val df = Seq(
      (1L, "the the the the the the"),            // all stopwords
      (2L, "spark catalyst optimizer rules engine planning")
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.withQuality(df)
      .select($"doc_id", $"stop_ratio", $"quality_ok").collect()
    val m = rows.map(r => r.getLong(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(m(1L)._1 == 1.0 && m(1L)._2 == 0)
    assert(m(2L)._1 == 0.0 && m(2L)._2 == 1)
  }

  test("langId votes with priority ordering") {
    val df = Seq(
      (1L, "the cat and the dog of it"),
      (2L, "el gato la casa de madrid"),
      (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.withLangId(df)
      .select($"doc_id", $"pred_lang").as[(Long, String)].collect().toMap
    assert(m == Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("multimodal: binary payload round-trip through mapPartitions batch") {
    val feats = ExtensionQueries.mediaFeatures(spark, sf0001)
    assert(feats.count() == 500)
    val r = feats.where($"media_id" === 0).collect()(0)
    assert(r.getAs[String]("kind") == "text/utf-8")
    assert(r.getAs[Long]("n_bytes") > 0)
    assert(r.getAs[Double]("brightness") > 0.0) // ascii text avg byte
    // checksum deterministic across runs
    val again = ExtensionQueries.mediaFeatures(spark, sf0001)
      .where($"media_id" === 0).collect()(0)
    assert(again.getAs[Long]("checksum") == r.getAs[Long]("checksum"))
  }

  test("decodeStub: empty payload is safe") {
    assert(Multimodal.decodeStub(Array.emptyByteArray) == (0L, 0.0))
  }

  test("imageio decode: PNG round-trip recovers exact dims and luma sum") {
    for (id <- Seq(0L, 1L, 17L, 199L)) {
      val w = (8 + id % 9).toInt
      val h = (8 + id % 7).toInt
      val expected = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(Multimodal.decodeImageMeta(Multimodal.syntheticPng(id))
        .contains((w, h, expected)), s"id=$id")
    }
  }

  test("imageio decode: undecodable bytes dead-letter as nulls") {
    assert(Multimodal.decodeImageMeta("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImageMeta(Array.emptyByteArray).isEmpty)
    val media = Seq(
      (1L, Multimodal.syntheticPng(1L)),
      (2L, "garbage".getBytes("UTF-8"))).toDF("media_id", "payload")
    val rows = Multimodal.imageMeta(spark, media).collect()
      .map(m => m.media_id -> m.width.isDefined).toMap
    assert(rows == Map(1L -> true, 2L -> false))
  }

  test("sampleFrames: fixed-size chunks, every stride-th kept, short tail") {
    val media = Seq((7L, "video/fake", ("x" * 250).getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload")
    val frames = Multimodal.sampleFrames(media, frameBytes = 100, stride = 2)
      .select($"frame_idx", $"frame_bytes").as[(Int, Long)]
      .collect().toMap
    // chunks: 100,100,50 → sampled idx 0 and 2
    assert(frames == Map(0 -> 100L, 2 -> 50L))
    val empty = Multimodal.sampleFrames(
      Seq((8L, "video/fake", Array.emptyByteArray))
        .toDF("media_id", "kind", "payload"), 100, 2)
    assert(empty.count() == 0)
  }
}
