package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video carried
  * as opaque `binary` columns with typed metadata, processed by
  * per-partition batch operators.
  *
  * IMAGE decode is REAL: [[decodeImage]] uses the JDK's `javax.imageio`
  * (PNG/JPEG/BMP/GIF ship with every JRE, headless included — no external
  * library) to produce a row-major grayscale grid. AUDIO decode is REAL
  * for the formats the JDK ships (`javax.sound.sampled`: WAV/AIFF/AU with
  * PCM payloads): [[decodeAudio]] produces normalized mono samples plus
  * the sample rate. VIDEO codecs are not in the JDK, so that kind falls
  * back to [[decodePixelsStub]], a deterministic fake derived from the
  * content bytes — every downstream operator (resize, feature extraction,
  * frame sampling) runs the real Spark plumbing (schemas, encoders,
  * partition-batched execution, shuffle-free narrow maps) with
  * reproducible values either way.
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

  // ImageIO's default stream cache spills to temp FILES per decode — pure
  // overhead for in-memory byte arrays on executors; switch it off once.
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Images above this pixel count fall back to the stub instead of
    * allocating: a decompression-bomb header (tiny file, huge declared
    * dimensions) must not OOM an executor. 2^24 px ≈ 4096×4096 ≈ 67 MB of
    * floats — far above any sane training thumbnail.
    */
  val MaxDecodePixels: Long = 1L << 24

  /** Container magic-byte sniff for the image formats the JDK decodes
    * (PNG/JPEG/GIF/BMP/TIFF). Gating [[decodeImage]] on this makes the
    * garbage-bytes path — the COMMON path in a crawled corpus — a 4-byte
    * comparison instead of a full ImageIO provider probe (stream setup +
    * internal exceptions per row: measured ~ms/row, which at corpus scale
    * dwarfs the decode itself). WBMP (magic-less) is deliberately not
    * probed — rejecting random bytes fast matters more than a format no
    * crawl pipeline ships.
    */
  def looksLikeImage(b: Array[Byte]): Boolean = b != null && b.length >= 4 && (
    (b(0) == 0x89.toByte && b(1) == 0x50) ||                   // PNG
    (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||            // JPEG
    (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||             // GIF
    (b(0) == 'B' && b(1) == 'M') ||                            // BMP
    (b(0) == 0x49 && b(1) == 0x49 && b(2) == 0x2A && b(3) == 0) || // TIFF LE
    (b(0) == 0x4D && b(1) == 0x4D && b(2) == 0 && b(3) == 0x2A))   // TIFF BE

  /** Container magic-byte sniff for JDK-decodable audio: WAV (RIFF),
    * AIFF/AIFC (FORM), AU (.snd). Same reasoning as [[looksLikeImage]] —
    * `AudioSystem.getAudioInputStream` walks every installed provider and
    * throws internally on unrecognized bytes, which is the per-row cost
    * the sniff removes.
    */
  def looksLikeAudio(b: Array[Byte]): Boolean = b != null && b.length >= 4 && (
    (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
    (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||
    (b(0) == 0x2E && b(1) == 0x73 && b(2) == 0x6E && b(3) == 0x64))

  /** REAL image decode via the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF —
    * content-sniffed, no external dependency): bytes → row-major grayscale
    * grid in [0,1] (ITU-R BT.601 luma: 0.299·R + 0.587·G + 0.114·B) plus
    * the native (width, height). Returns None for bytes no JDK reader
    * recognizes; [[looksLikeImage]] short-circuits the probe.
    */
  def decodeImage(content: Array[Byte]): Option[(Array[Float], Int, Int)] = {
    imageIoNoDiskCache
    if (content == null || content.isEmpty || !looksLikeImage(content)) None
    else {
      // ImageIO throws RuntimeExceptions, not just IOException, on corrupt
      // bytes (CMMException on broken ICC profiles, AIOOBE on truncated
      // scanlines) — a crawled corpus WILL contain such rows, and one must
      // degrade to the stub, not kill the task.
      val img =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
        catch { case scala.util.control.NonFatal(_) => None }
      img.filter(im =>
          im.getWidth.toLong * im.getHeight <= MaxDecodePixels)
        .map { im =>
        val w = im.getWidth
        val h = im.getHeight
        val out = new Array[Float](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            out(y * w + x) = ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat
            x += 1
          }
          y += 1
        }
        (out, w, h)
      }
    }
  }

  /** Samples above this count fall back to the stub instead of allocating
    * — same decompression-bomb reasoning as [[MaxDecodePixels]]: 2^26
    * samples ≈ 25 min of 44.1 kHz mono ≈ 256 MB of floats.
    */
  val MaxDecodeSamples: Long = 1L << 26

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * with PCM payloads — content-sniffed, no external dependency): bytes →
    * mono samples in [-1,1] (channels averaged) plus the sample rate.
    * Returns None for bytes no JDK reader recognizes (MP3/OGG/FLAC need
    * external codecs → stub path).
    */
  def decodeAudio(content: Array[Byte]): Option[(Array[Float], Int)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (content == null || content.isEmpty || !looksLikeAudio(content)) return None
    val in =
      try Some(AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(content)))
      catch { case scala.util.control.NonFatal(_) => None }
    in.flatMap { stream =>
      try {
        val src = stream.getFormat
        // normalize any PCM variant (8/24/32-bit, big-endian, unsigned) to
        // signed 16-bit little-endian at the native rate/channel count
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, false)
        val pcm = AudioSystem.getAudioInputStream(target, stream)
        val channels = target.getChannels
        val frames = pcm.getFrameLength
        if (frames <= 0 || frames > MaxDecodeSamples) None
        else {
          val bytes = pcm.readAllBytes()
          val n = bytes.length / (2 * channels)
          val out = new Array[Float](n)
          var i = 0
          while (i < n) {
            var sum = 0.0f
            var ch = 0
            while (ch < channels) {
              val o = (i * channels + ch) * 2
              val s = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
              sum += s / 32768.0f
              ch += 1
            }
            out(i) = sum / channels
            i += 1
          }
          Some((out, target.getSampleRate.toInt))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      finally stream.close()
    }
  }

  /** Decode to a `(pixels, srcW, srcH)` grid: REAL for decodable images,
    * the deterministic stub at (stubW, stubH) for everything else
    * (audio/video codecs are not in the JDK; undecodable image bytes also
    * fall back rather than fail the partition).
    */
  def decodeAny(kind: String, content: Array[Byte], stubW: Int, stubH: Int):
      (Array[Float], Int, Int) = {
    val bytes = Option(content).getOrElse(Array.emptyByteArray)
    val real = if (kind == "image") decodeImage(bytes) else None
    real.getOrElse((decodePixelsStub(bytes, stubW, stubH), stubW, stubH))
  }

  /** The stub's offset GENERATORS are content-independent: pixel i of any
    * stub decode reads `content[(stubOffsetGens(n)(i) % content.length)]`,
    * where the generator sequence depends only on the LCG constants and i.
    * Exposed so an external engine can replay the stub with pure integer
    * arithmetic (the q79/q80 DuckDB oracles embed these as literals) —
    * values fit in 31 bits (top 33 bits shifted away). MUST stay in sync
    * with [[decodePixelsStub]]'s loop (StubOffsetSpec pins the equality).
    */
  def stubOffsetGens(n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var acc = 1125899906842597L
    var i = 0
    while (i < n) {
      acc = acc * 6364136223846793005L + 1442695040888963407L
      out(i) = acc >>> 33
      i += 1
    }
    out
  }

  /** STUB — deterministic fake decode: "pixel" (i) = content byte at a
    * hash-derived offset. Used for kinds the JDK cannot decode (audio,
    * video) so their plumbing stays testable; images take the REAL
    * [[decodeImage]] path.
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

  /** Decode (real for images, stub otherwise) + resample to the target
    * grid + feature-extract, batched per partition. The partition iterator
    * shape is exactly what a vectorized codec batch would use.
    */
  def extractFeatures(media: DataFrame, targetW: Int = 8, targetH: Int = 8):
      Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          val (raw, sw, sh) = decodeAny(kind, bytes, targetW, targetH)
          val px = if (sw == targetW && sh == targetH) raw
            else resizeBilinear(raw, sw, sh, targetW, targetH)
          val n = px.length
          var sum = 0.0
          var i = 0
          while (i < n) { sum += px(i); i += 1 }
          val mean = if (n > 0) sum / n else 0.0
          var ss = 0.0
          i = 0
          while (i < n) { val d = px(i) - mean; ss += d * d; i += 1 }
          val variance = if (n > 0) ss / n else 0.0
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

  final case class AudioFeatures(media_id: Long, kind: String,
      decoded: Boolean, sample_rate: Int, n_samples: Int, duration_ms: Long,
      rms: Double, peak: Double, zero_cross_rate: Double)

  /** Audio curation features — RMS level, peak, zero-crossing rate,
    * duration — REAL for JDK-decodable audio ([[decodeAudio]]), derived
    * from the deterministic stub otherwise (`decoded` says which). Same
    * partition-batched narrow-map shape as [[extractFeatures]]: bytes
    * never leave their partition, no shuffle.
    */
  def extractAudioFeatures(media: DataFrame, stubRate: Int = 16000,
      stubSamples: Int = 1024): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          val real = if (kind == "audio") decodeAudio(bytes) else None
          val (samples, rate) = real.getOrElse {
            // stub pixels are in [0,1] — recentre to the audio range
            val px = decodePixelsStub(
              Option(bytes).getOrElse(Array.emptyByteArray), stubSamples, 1)
            var i = 0
            while (i < px.length) { px(i) = px(i) * 2f - 1f; i += 1 }
            (px, stubRate)
          }
          val n = samples.length
          var ss = 0.0
          var peak = 0.0
          var crossings = 0L
          var i = 0
          while (i < n) {
            val s = samples(i)
            ss += s.toDouble * s
            val a = math.abs(s.toDouble)
            if (a > peak) peak = a
            if (i > 0 && (samples(i - 1) >= 0) != (s >= 0)) crossings += 1
            i += 1
          }
          AudioFeatures(id, kind, real.isDefined, rate, n,
            if (rate > 0) n * 1000L / rate else 0L,
            if (n > 0) math.sqrt(ss / n) else 0.0, peak,
            if (n > 1) crossings.toDouble / (n - 1) else 0.0)
        }
      }
  }

  final case class ResizedMedia(media_id: Long, kind: String, pixels: Array[Float])

  /** Decode (real for images — at their NATIVE resolution; stub at
    * (srcW, srcH) otherwise), then bilinear resize to the target grid —
    * partition-batched like [[extractFeatures]].
    */
  def decodeAndResize(media: DataFrame, srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          val (px, sw, sh) = decodeAny(kind, bytes, srcW, srcH)
          ResizedMedia(id, kind, resizeBilinear(px, sw, sh, dstW, dstH))
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
