package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads plus
  * typed metadata, with decode / feature-extraction as per-partition
  * batch transforms.
  *
  * The decode itself is STUBBED (no image/audio libs in this container —
  * `decodeStub` produces deterministic fake features from the bytes); the
  * Spark-side plumbing is real: schema, `Dataset[T]` encoders, partition
  * iterator batching (the Scala analogue of `mapInPandas` batches), and a
  * narrow no-shuffle plan. Swapping `decodeStub` for a JNI/ffmpeg call is
  * a one-function change.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, format: String)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, brightness: Double)

  /** Deterministic fake "decode": byte stats standing in for a pixel
    * decode. Replace with a real codec at deployment.
    */
  def decodeStub(payload: Array[Byte]): (Long, Double) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum = sum * 31 + (payload(i) & 0xff); i += 1 }
    val brightness =
      if (payload.isEmpty) 0.0
      else payload.iterator.map(b => (b & 0xff).toDouble).sum / payload.length
    (sum, brightness)
  }

  /** Feature extraction as a per-partition batch transform: one iterator
    * pass per partition (no per-row closure dispatch), narrow plan, output
    * schema fixed by the `MediaFeatures` encoder.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (checksum, brightness) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong,
          checksum, brightness)
      }
    }
  }

  /** Frame sampling: chunk the payload into fixed-size frames and keep
    * every `stride`-th one — the video-frame / audio-window shape. All
    * narrow (chunk expression + posexplode + filter), no shuffle; the
    * per-frame decode below is the stubbed codec call.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val chunks = org.apache.spark.sql.GraftSqlBridge.toColumn(
      graft.functions.BinaryChunksExpr(
        org.apache.spark.sql.GraftSqlBridge.toExpression(col("payload")),
        frameBytes))
    media.select(col("media_id"), col("kind"),
      posexplode(chunks).as(Seq("frame_idx", "frame")))
      .where(col("frame_idx") % stride === 0)
      .withColumn("frame_bytes", octet_length(col("frame")).cast("long"))
  }

  /** Wrap any table's text column as a synthetic media table — exercises
    * the binary-column path with the data we have.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"), lit("text/utf-8").as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(0).as("width"), lit(0).as("height"), lit("raw").as("format"))
      .as[MediaRow]
  }
}
