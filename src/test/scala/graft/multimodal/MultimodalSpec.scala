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

  test("frame sampling derives offsets from metadata only") {
    val got = Multimodal.sampleFrameOffsets(mediaDf, 4)
      .select("media_id", "frame_offsets_ms").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(2L).get.asInstanceOf[scala.collection.Seq[Long]]
      == Seq(0L, 2500L, 5000L, 7500L))
    assert(got(1L).isEmpty && got(3L).isEmpty) // non-video -> null
  }
}
