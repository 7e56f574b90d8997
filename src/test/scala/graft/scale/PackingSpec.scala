package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed prefix sum vs the single-partition window ground truth,
  * partitioning invariance, and the chunk-coordinate arithmetic.
  */
class PackingSpec extends SparkSpec {

  import spark.implicits._

  test("prefixSum == single-partition window, any input partitioning") {
    val df = (1L to 1000L).map(i => (i, i % 17)).toDF("id", "n")
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      .rowsBetween(Long.MinValue, -1)
    val want = df.withColumn("prefix", coalesce(sum($"n").over(w), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap

    for (parts <- Seq(1, 7, 32)) {
      val got = Packing.prefixSum(df.repartition(parts, $"n"), "id", "n")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("prefix conservation: last prefix + last n == total") {
    val df = (1L to 500L).map(i => (i, (i * 7) % 23)).toDF("id", "n")
    val rows = Packing.prefixSum(df, "id", "n")
      .orderBy("id").collect()
    val total = df.agg(sum($"n")).head().getLong(0)
    assert(rows.last.getLong(2) + rows.last.getLong(1) == total)
    // strictly monotone in id order, stepping by exactly n
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + a.getLong(1))
    }
  }

  test("prefixSum resolves on parquet-backed tables (r5 q64 regression)") {
    // The r5 defect: the typed view kept the source column names, so
    // repartitionByRange(col("_1")) resolved on local tuple relations
    // (already named _1/_2) but threw UNRESOLVED_COLUMN on any parquet
    // scan. Round-trip the fixture through parquet so the spec sees the
    // real schema path, then run the full concatChunk over it.
    val dir = java.nio.file.Files.createTempDirectory("packing-pq").toFile
    try {
      val docs = (1L to 300L)
        .map(i => (i, Seq.fill((i % 9).toInt)("w").mkString(" ")))
        .toDF("doc_id", "text")
      docs.write.mode("overwrite").parquet(dir + "/documents")
      val pq = spark.read.parquet(dir + "/documents")

      val counts = pq.select($"doc_id",
        size(TextOps.tokens($"text")).cast("long").as("n_tokens"))
      val got = Packing.prefixSum(counts, "doc_id", "n_tokens")
        .orderBy("doc_id").collect()
      assert(got.length == 300)
      // exclusive prefix: strictly stepping by n in id order, from 0
      assert(got.head.getLong(2) == 0L)
      got.sliding(2).foreach { case Array(a, b) =>
        assert(b.getLong(2) == a.getLong(2) + a.getLong(1))
      }

      val chunked = Packing.concatChunk(pq, "doc_id", "text", seqLen = 16L)
      assert(chunked.count() == 300)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("concatChunk coordinates: boundaries, spans, zero-token docs") {
    val docs = Seq(
      (1L, "a b c d"),          // 4 tokens: [0,4) -> seq 0
      (2L, ""),                 // 0 tokens at position 4 -> seq 0..0
      (3L, "e f g h i"),        // 5 tokens: [4,9) -> spans seq 0..1 (L=8)
      (4L, "j k l m n o p"),    // 7 tokens: [9,16) -> spans seq 1..1
      (5L, "q")                 // 1 token: [16,17) -> seq 2
    ).toDF("doc_id", "text")
    val out = Packing.concatChunk(docs, "doc_id", "text", seqLen = 8L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out(0) == ((1L, 4L, 0L, 0L, 0L)))
    assert(out(1) == ((2L, 0L, 4L, 0L, 0L)))
    assert(out(2) == ((3L, 5L, 4L, 0L, 1L)))
    assert(out(3) == ((4L, 7L, 9L, 1L, 1L)))
    assert(out(4) == ((5L, 1L, 16L, 2L, 2L)))
  }

  test("packManifest: slice conservation per doc and per sequence") {
    val docs = Seq(
      (1L, "a b c d"),          // [0,4) in seq 0
      (2L, ""),                 // empty at 4
      (3L, "e f g h i"),        // [4,9): 4 tokens in seq 0, 1 in seq 1
      (4L, "j k l m n o p"),    // [9,16) in seq 1
      (5L, "q")                 // [16,17) in seq 2 (tail)
    ).toDF("doc_id", "text")
    val m = Packing.packManifest(docs, "doc_id", "text", seqLen = 8L)
      .orderBy("seq_id", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(m.toSeq == Seq(
      (0L, 1L, 0L, 4L, 0L),   // doc 1 fills cells 0..3 of seq 0
      (0L, 2L, 0L, 0L, 4L),   // empty doc: zero-length marker at cell 4
      (0L, 3L, 0L, 4L, 4L),   // doc 3 head fills cells 4..7
      (1L, 3L, 4L, 1L, 0L),   // doc 3 tail token opens seq 1
      (1L, 4L, 0L, 7L, 1L),   // doc 4 fills the rest of seq 1
      (2L, 5L, 0L, 1L, 0L)))  // tail sequence
    // conservation: per doc, slices sum to n_tokens; per full sequence,
    // slices sum to seqLen
    val perDoc = m.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(perDoc == Map(1L -> 4L, 2L -> 0L, 3L -> 5L, 4L -> 7L, 5L -> 1L))
    val perSeq = m.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(perSeq(0L) == 8L && perSeq(1L) == 8L && perSeq(2L) == 1L)
  }

  test("lengthBatches: batch size, bucket coherence, padding — both salt paths") {
    val docs = (1L to 60L).map { i =>
      (i, Seq.fill((i % 13 + 1).toInt)("tok").mkString(" "))
    }.toDF("doc_id", "text").repartition(5)
    for (salts <- Seq(1, 4)) {
      val rows = Packing.lengthBatches(docs, "doc_id", "text",
        batchSize = 4, bucketWidth = 5, saltBuckets = salts)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      assert(rows.length == 60)
      val byBatch = rows.groupBy(_._4)
      byBatch.foreach { case (_, b) =>
        assert(b.length <= 4, "batch exceeds batchSize")
        assert(b.map(_._3).distinct.length == 1, "batch crosses a bucket")
        val mx = b.map(_._2).max
        b.foreach { r =>
          assert(r._5 == mx && r._6 == mx - r._2, "padding arithmetic")
          assert(r._6 < 5, "padding exceeds bucketWidth-1")
        }
      }
      // every doc appears exactly once
      assert(rows.map(_._1).sorted.toSeq == (1L to 60L))
    }
    // canonical path is deterministic across partitionings
    val a = Packing.lengthBatches(docs, "doc_id", "text", 4, 5)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Packing.lengthBatches(docs.repartition(13), "doc_id", "text", 4, 5)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
