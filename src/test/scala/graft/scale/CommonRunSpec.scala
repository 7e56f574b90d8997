package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CommonRunSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side ground truth: pairs sharing an exact t-char run. */
  private def bruteForce(docs: Seq[(Long, String)], t: Int): Seq[(Long, Long)] = {
    def grams(s: String): Set[String] =
      if (s.length < t) Set.empty
      else (0 to s.length - t).map(i => s.substring(i, i + t)).toSet
    val g = docs.map { case (id, s) => id -> grams(s) }
    (for {
      (ia, ga) <- g; (ib, gb) <- g
      if ia < ib && ga.exists(gb.contains)
    } yield (ia, ib)).sorted
  }

  private def run(docs: Seq[(Long, String)], k: Int = 16, w: Int = 8,
      maxBucket: Int = 1024): Seq[(Long, Long)] =
    Dedup.commonRunPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
      k, w, maxBucket)
      .orderBy($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("pairs exactly the docs sharing a t-run; sub-t overlap is rejected") {
    val t23 = "the quick brown fox jump"  // 24 chars ≥ t=23
    val t22 = "abcdefghijklmnopqrstuv"    // 22 chars < t
    val docs = Seq(
      (1L, s"prefix one $t23 suffix one padding padding"),
      (2L, s"totally different head $t23 and another tail"),
      (3L, s"shares only the short $t22 run with number four"),
      (4L, s"$t22. opens this document but nothing longer matches"),
      (5L, "no overlap with anything else at all here, unique text entirely"))
    assert(run(docs) == Seq((1L, 2L)))
    assert(run(docs) == bruteForce(docs, 23))
  }

  test("brute-force parity on an overlapping template corpus") {
    val tmpl = "Patient presented with elevated glucose levels and was advised"
    val docs = (0L until 40L).map { i =>
      val body =
        if (i % 3 == 0) s"case $i: $tmpl to monitor diet. note $i"
        else if (i % 3 == 1) s"record $i — $tmpl to exercise. extra ${i * 7}"
        else s"unique document body number $i with its own words ${i * 31} end"
      (i, body)
    }
    assert(run(docs) == bruteForce(docs, 23))
    assert(run(docs).nonEmpty)
  }

  test("triangle-split skew path returns the identical pair set") {
    val tmpl = "this exact boilerplate sentence appears in every single page"
    val docs = (0L until 30L).map(i => (i, s"doc $i: $tmpl tail ${i * 13}"))
    val plain = run(docs)
    val split = run(docs, maxBucket = 4) // forces multi-block cells
    assert(plain == split)
    assert(plain.size == 30 * 29 / 2) // template pairs everyone
  }

  test("docs shorter than t never pair and never crash the sequence exprs") {
    val docs = Seq((1L, "tiny"), (2L, "tiny"), (3L, ""),
      (4L, "exactly twenty-two ch."))
    assert(run(docs) == Seq.empty)
  }

  test("parquet-backed documents table matches the brute force at sf0.001") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = Dedup.commonRunPairs(
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001"),
      "doc_id", "text", k = 16, w = 8)
      .orderBy($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == bruteForce(docs, 23))
  }
}
