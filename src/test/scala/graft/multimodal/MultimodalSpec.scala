package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", Array.fill[Byte](256)(42),
        Row("image/jpeg", 640, 480, null, null)),
      Row(2L, "video", (0 until 512).map(_.toByte).toArray,
        Row("video/mp4", 1920, 1080, null, 10000L)),
      Row(3L, "audio", Array[Byte](1, 2, 3),
        Row("audio/wav", null, null, 44100, 2500L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  test("media schema round-trips through parquet with binary payloads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    mediaDf.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet read-back relaxes nullability; compare names and types
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 3)
    // metadata-only query must not touch content (column pruning)
    val plan = back.select("media_id", "meta.mime").queryExecution
      .executedPlan.toString
    assert(plan.contains("media_id") && !plan.contains("content"))
  }

  test("byte stats are real content-derived signals") {
    val got = Multimodal.byteStats(mediaDf).select("media_id", "content_len")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 256L, 2L -> 512L, 3L -> 3L))
  }

  test("stubbed decode + feature extraction is deterministic per content") {
    val f1 = Multimodal.extractFeatures(mediaDf).collect()
      .map(f => f.media_id -> f).toMap
    val f2 = Multimodal.extractFeatures(mediaDf).collect()
      .map(f => f.media_id -> f).toMap
    assert(f1.keySet == Set(1L, 2L, 3L))
    f1.foreach { case (id, f) =>
      assert(f.n_pixels == 64)
      assert(f.mean_intensity == f2(id).mean_intensity) // reproducible
    }
    // constant-byte image -> zero variance; mixed bytes -> positive
    assert(f1(1L).intensity_var == 0.0)
    assert(f1(2L).intensity_var > 0.0)
  }

  test("bilinear resize: exact interpolation values, edges clamped") {
    // 2x2 checkerboard -> 1x1: the single output samples the exact center
    val down = Multimodal.resizeBilinear(
      Array(0f, 1f, 1f, 0f), 2, 2, 1, 1)
    assert(down.toSeq == Seq(0.5f))
    // 2x2 -> 4x4: corners clamp to the source corners; center of each
    // quadrant-adjacent pair interpolates linearly
    val up = Multimodal.resizeBilinear(Array(0f, 1f, 1f, 0f), 2, 2, 4, 4)
    assert(up(0) == 0f && up(3) == 1f && up(12) == 1f && up(15) == 0f)
    // row 0: sx for x=1 is (1.5*0.5)-0.5 = 0.25 -> 0.75*0 + 0.25*1
    assert(math.abs(up(1) - 0.25f) < 1e-6)
    assert(math.abs(up(2) - 0.75f) < 1e-6)
    // identity resize returns the input
    val id = Multimodal.resizeBilinear(Array(0.1f, 0.2f, 0.3f, 0.4f), 2, 2, 2, 2)
    assert(id.toSeq == Seq(0.1f, 0.2f, 0.3f, 0.4f))
  }

  test("decode+resize runs partition-batched over the media frame") {
    val out = Multimodal.decodeAndResize(mediaDf, 8, 8, 4, 4).collect()
      .map(r => r.media_id -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    out.values.foreach(r => assert(r.pixels.length == 16))
    // deterministic: same content -> same resized pixels
    val again = Multimodal.decodeAndResize(mediaDf, 8, 8, 4, 4).collect()
      .map(r => r.media_id -> r.pixels.toSeq).toMap
    out.foreach { case (id, r) => assert(r.pixels.toSeq == again(id)) }
  }

  private def resourceBytes(path: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(path)
    try in.readAllBytes() finally in.close()
  }

  /** The golden gradient's pixels, recomputed from the generator formula
    * (tools/ fixture: 8x6, r = x*255/7, g = y*255/5, b = (x+y)*255/12).
    */
  private def gradientLuma(w: Int = 8, h: Int = 6): Array[Float] =
    Array.tabulate(w * h) { i =>
      val x = i % w
      val y = i / w
      val r = x * 255 / (w - 1)
      val g = y * 255 / (h - 1)
      val b = (x + y) * 255 / (w + h - 2)
      ((0.299 * r + 0.587 * g + 0.114 * b) / 255.0).toFloat
    }

  test("real PNG decode: exact BT.601 luma from the golden 2x2 image") {
    val got = Multimodal.decodeImage(resourceBytes("/fixtures/golden_rgbw.png"))
    assert(got.isDefined, "JDK ImageIO must decode the checked-in PNG")
    val (px, w, h) = got.get
    assert((w, h) == (2, 2))
    // red, green / blue, white at the BT.601 weights exactly
    val expected = Seq(0.299f, 0.587f, 0.114f, 1.0f)
    px.toSeq.zip(expected).foreach { case (a, e) =>
      assert(math.abs(a - e) < 1e-6, s"got ${px.toSeq}") }
  }

  test("real decode + features + resize produce exact values end-to-end") {
    val bytes = resourceBytes("/fixtures/golden_gradient.png")
    val expected = gradientLuma()
    // decodeAny takes the REAL path for images (stub dims ignored)
    val (px, w, h) = Multimodal.decodeAny("image", bytes, 3, 3)
    assert((w, h) == (8, 6))
    assert(px.toSeq == expected.toSeq)
    // e2e through the partition-batched operators
    val rows = Seq(Row(9L, "image", bytes, Row("image/png", 8, 6, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val feats = Multimodal.extractFeatures(df, targetW = 8, targetH = 6).collect().head
    val n = expected.length
    val mean = expected.map(_.toDouble).sum / n
    val variance = expected.map(p => (p - mean) * (p - mean)).sum / n
    assert(feats.n_pixels == n)
    assert(math.abs(feats.mean_intensity - mean) < 1e-12)
    assert(math.abs(feats.intensity_var - variance) < 1e-12)
    // native-resolution decode feeds the (already exact-value-tested)
    // bilinear resample
    val resized = Multimodal.decodeAndResize(df, 3, 3, 4, 3).collect().head
    assert(resized.pixels.toSeq
      == Multimodal.resizeBilinear(expected, 8, 6, 4, 3).toSeq)
  }

  test("undecodable image bytes fall back to the deterministic stub") {
    val garbage = Array.fill[Byte](64)(42)
    val (px, w, h) = Multimodal.decodeAny("image", garbage, 4, 4)
    assert((w, h) == (4, 4))
    assert(px.toSeq == Multimodal.decodePixelsStub(garbage, 4, 4).toSeq)
    // audio/video always take the stub path
    val (apx, _, _) = Multimodal.decodeAny("audio", garbage, 4, 4)
    assert(apx.toSeq == px.toSeq)
  }

  /** 16-bit PCM WAV bytes built through the same JDK encoder the decoder
    * uses (javax.sound.sampled ships in every JRE) — interleaved channels,
    * little-endian.
    */
  private def wavBytes(samples: Array[Short], rate: Float, channels: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      channels, 2 * channels, rate, false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data),
      fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decode: exact 16-bit sample values and rate") {
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 1)
    val got = Multimodal.decodeAudio(wavBytes(samples, 8000f, 1))
    assert(got.isDefined, "JDK javax.sound must decode PCM WAV")
    val (out, rate) = got.get
    assert(rate == 8000)
    assert(out.toSeq == samples.toSeq.map(_ / 32768.0f))
  }

  test("real WAV decode: stereo downmixes to the channel average") {
    // frames: (L,R) = (16384, -16384), (8192, 8192), (-32768, 0)
    val interleaved = Array[Short](16384, -16384, 8192, 8192, -32768, 0)
    val (out, rate) = Multimodal.decodeAudio(wavBytes(interleaved, 44100f, 2)).get
    assert(rate == 44100)
    assert(out.toSeq == Seq(0.0f, 0.25f, -0.5f))
  }

  test("undecodable audio bytes return None; feature operator falls back to stub") {
    assert(Multimodal.decodeAudio(Array.fill[Byte](64)(42)).isEmpty)
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)
    val rows = Seq(Row(7L, "audio", Array.fill[Byte](64)(42),
      Row("audio/mpeg", null, null, 44100, 1000L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val f = Multimodal.extractAudioFeatures(df, stubSamples = 256).collect().head
    assert(!f.decoded)
    assert(f.n_samples == 256 && f.sample_rate == 16000)
    // deterministic: same content -> same stub features
    val f2 = Multimodal.extractAudioFeatures(df, stubSamples = 256).collect().head
    assert(f == f2)
  }

  test("audio features: exact RMS/peak/zero-crossings on a real WAV") {
    // 8000 samples of a +/-16384 square wave at 8 kHz: amplitude 0.5,
    // 1000 ms, a crossing at every sample boundary
    val samples = Array.tabulate[Short](8000)(i => if (i % 2 == 0) 16384 else -16384)
    val rows = Seq(Row(8L, "audio", wavBytes(samples, 8000f, 1),
      Row("audio/wav", null, null, 8000, 1000L)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val f = Multimodal.extractAudioFeatures(df).collect().head
    assert(f.decoded)
    assert(f.sample_rate == 8000 && f.n_samples == 8000)
    assert(f.duration_ms == 1000L)
    assert(f.rms == 0.5 && f.peak == 0.5)
    assert(f.zero_cross_rate == 1.0)
  }

  test("frame sampling derives offsets from metadata only") {
    val got = Multimodal.sampleFrameOffsets(mediaDf, 4)
      .select("media_id", "frame_offsets_ms").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(2L).get.asInstanceOf[scala.collection.Seq[Long]]
      == Seq(0L, 2500L, 5000L, 7500L))
    assert(got(1L).isEmpty && got(3L).isEmpty) // non-video -> null
  }

  test("stubOffsetGens replays decodePixelsStub exactly (the q79/q80 oracle contract)") {
    val gens = Multimodal.stubOffsetGens(64)
    assert(gens.forall(g => g >= 0 && g < (1L << 31))) // 31-bit literals
    for (len <- Seq(1, 3, 16, 255)) {
      val content = Array.tabulate[Byte](len)(j => ((j * 13 + 5) % 256).toByte)
      val px = Multimodal.decodePixelsStub(content, 8, 8)
      val replay = gens.map(g =>
        (content((g % len).toInt) & 0xff) / 255.0f)
      assert(px.toSeq == replay.toSeq)
    }
  }

  test("derived media fixture: byte j of content is (doc_id*31 + j*7) mod 256") {
    val sfDir = sys.env.getOrElse("GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
    assume(new java.io.File(sfDir).isDirectory, s"testdata absent: $sfDir")
    val media = graft.suite.MultimodalQueries.media(spark, sfDir)
    assert(media.schema("content").dataType
      == org.apache.spark.sql.types.BinaryType)
    media.select("media_id", "content", "kind").limit(50).collect().foreach { r =>
      val d = r.getLong(0)
      val bytes = r.getAs[Array[Byte]](1)
      assert(bytes.length == 16 + (d % 240).toInt)
      bytes.zipWithIndex.foreach { case (b, j) =>
        assert((b & 0xff) == ((d * 31 + j * 7) % 256).toInt, s"doc $d byte $j")
      }
      assert(r.getString(2)
        == Seq("image", "audio", "video")((d % 3).toInt))
    }
  }
}
