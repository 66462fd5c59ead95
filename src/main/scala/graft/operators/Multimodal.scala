package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads plus
  * typed metadata, with decode / feature-extraction as per-partition
  * batch transforms.
  *
  * IMAGE decode is REAL — JDK `javax.imageio` (PNG/JPEG/GIF/BMP), no
  * external dependency: [[decodeImageMeta]] / [[imageMeta]] yield
  * width, height and an exact integer luma sum per image, dead-lettering
  * undecodable bytes as nulls. Audio/video decode remains STUBBED
  * (`decodeStub` — no codec libs in this container); its Spark-side
  * plumbing is real (schema, `Dataset[T]` encoders, partition-iterator
  * batching, narrow no-shuffle plans), so swapping in a JNI/ffmpeg call
  * is a one-function change.
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

  /** Decoded image metadata row; null fields = undecodable payload. */
  final case class ImageMeta(media_id: Long, width: Option[Int],
                             height: Option[Int], luma_sum: Option[Long])

  /** REAL image decode via JDK `javax.imageio`: width, height, and the
    * integer luma sum Σ ⌊(r+g+b)/3⌋ over all pixels (integer so results
    * are exactly reproducible — no float mean). `None` for bytes no
    * registered reader accepts (dead-letter, never poison-the-task).
    */
  def decodeImageMeta(payload: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3
            x += 1
          }
          y += 1
        }
        Some((w, h, sum))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Distributed image-meta extraction over (media_id, payload) — one
    * iterator pass per partition, narrow plan, decode cost rides the
    * scan.
    */
  def imageMeta(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeImageMeta(bytes) match {
          case Some((w, h, s)) => ImageMeta(id, Some(w), Some(h), Some(s))
          case None => ImageMeta(id, None, None, None)
        }
      })
  }

  /** Deterministic grayscale PNG for id (spec + oracle fixture):
    * (8 + id mod 9) × (8 + id mod 7), pixel v(x,y) =
    * (31·id + 7x + 13y) mod 256 in all three channels. PNG is lossless
    * and TYPE_INT_RGB skips color-profile conversion, so a decode
    * recovers these exact values on any JVM — which is what lets the
    * DuckDB oracle precompute width/height/luma from id alone.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((id * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
