package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video carried
  * as opaque `binary` columns with typed metadata, processed by
  * per-partition batch operators.
  *
  * The actual codec step (JPEG/PNG/WAV decode) is STUBBED — media libraries
  * are not available in this environment — behind [[decodePixelsStub]]: a
  * deterministic fake that derives "pixels" from the content bytes, so every
  * downstream operator (resize, feature extraction, frame sampling) runs the
  * real Spark plumbing (schemas, encoders, partition-batched execution,
  * shuffle-free narrow maps) with reproducible values. Swap the stub for a
  * real codec by replacing one function.
  *
  * Scale: all operators are narrow maps over the binary column —
  * no shuffle; binary payloads never leave their partition. The metadata
  * struct lets filters/pruning run WITHOUT touching the bytes (column
  * pruning keeps scans cheap when only metadata is queried).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),            // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  /** STUB — deterministic fake decode: "pixel" (i) = content byte at a
    * hash-derived offset. Replace with a real codec (e.g. TwelveMonkeys
    * ImageIO) for production; signature and downstream plumbing are final.
    */
  def decodePixelsStub(content: Array[Byte], w: Int, h: Int): Array[Float] = {
    val n = w * h
    val out = new Array[Float](n)
    if (content.nonEmpty) {
      var i = 0
      var acc = 1125899906842597L
      while (i < n) {
        acc = acc * 6364136223846793005L + 1442695040888963407L
        val idx = ((acc >>> 33) % content.length).toInt
        out(i) = (content(idx) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Byte-level content features (REAL, not stubbed): histogram entropy,
    * mean byte, size — the cheap quality signals a curation pipeline
    * filters on before spending decode cycles.
    */
  def byteStats(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val c = col(contentCol)
    df.withColumn("content_len", length(c).cast("long"))
      .withColumn("content_hash", xxhash64(c))
  }

  final case class MediaFeatures(media_id: Long, kind: String,
      n_pixels: Int, mean_intensity: Double, intensity_var: Double)

  /** Decode (stub) + feature-extract, batched per partition. The partition
    * iterator shape is exactly what a vectorized codec batch would use.
    */
  def extractFeatures(media: DataFrame, targetW: Int = 8, targetH: Int = 8):
      Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          val px = decodePixelsStub(
            Option(bytes).getOrElse(Array.emptyByteArray), targetW, targetH)
          val n = px.length
          val mean = if (n > 0) px.map(_.toDouble).sum / n else 0.0
          val variance =
            if (n > 0) px.map(p => (p - mean) * (p - mean)).sum / n else 0.0
          MediaFeatures(id, kind, n, mean, variance)
        }
      }
  }

  /** Bilinear resize of a row-major grayscale pixel grid — REAL math, not
    * stubbed (resize after decode is pure arithmetic; only the codec needs
    * a library). Standard align-corners-false sampling with edge clamp:
    * src coordinate of output pixel x is (x+0.5)·(srcW/dstW) − 0.5.
    */
  def resizeBilinear(px: Array[Float], srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Array[Float] = {
    require(px.length == srcW * srcH, s"expected ${srcW * srcH} pixels, got ${px.length}")
    val out = new Array[Float](dstW * dstH)
    val xs = srcW.toDouble / dstW
    val ys = srcH.toDouble / dstH
    var y = 0
    while (y < dstH) {
      val sy = math.min(math.max((y + 0.5) * ys - 0.5, 0.0), srcH - 1.0)
      val y0 = sy.toInt
      val y1 = math.min(y0 + 1, srcH - 1)
      val fy = sy - y0
      var x = 0
      while (x < dstW) {
        val sx = math.min(math.max((x + 0.5) * xs - 0.5, 0.0), srcW - 1.0)
        val x0 = sx.toInt
        val x1 = math.min(x0 + 1, srcW - 1)
        val fx = sx - x0
        val top = px(y0 * srcW + x0) * (1 - fx) + px(y0 * srcW + x1) * fx
        val bot = px(y1 * srcW + x0) * (1 - fx) + px(y1 * srcW + x1) * fx
        out(y * dstW + x) = (top * (1 - fy) + bot * fy).toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  final case class ResizedMedia(media_id: Long, kind: String, pixels: Array[Float])

  /** Decode (stub) at source resolution, then REAL bilinear resize to the
    * target grid — partition-batched like [[extractFeatures]].
    */
  def decodeAndResize(media: DataFrame, srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          val px = decodePixelsStub(
            Option(bytes).getOrElse(Array.emptyByteArray), srcW, srcH)
          ResizedMedia(id, kind, resizeBilinear(px, srcW, srcH, dstW, dstH))
        }
      }
  }

  /** Deterministic frame sampling for video rows: n evenly-spaced frame
    * timestamps from the metadata duration — pure column math, no decode.
    */
  def sampleFrameOffsets(media: DataFrame, nFrames: Int): DataFrame =
    media.withColumn("frame_offsets_ms",
      when(col("kind") === "video" && col("meta.duration_ms").isNotNull,
        transform(sequence(lit(0), lit(nFrames - 1)),
          i => (col("meta.duration_ms") * i / nFrames).cast("long"))))
}
