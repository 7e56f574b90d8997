package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Curation operators on crafted fixtures with hand-computed expectations:
  * decontamination set algebra, repetition-signal arithmetic (including
  * the short-doc guard rails), and quota determinism.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  private val P = 2147483647L
  private def bucket(id: Long): Long =
    Math.floorMod(1103515245L * Math.floorMod(id, P) + 12345L, P)

  test("contamination: copied eval doc reads 1.0, fresh reads 0.0, partial in between") {
    val frac = 0.5
    val thr = (frac * P).toLong
    // pick concrete ids on each side of the split with the same formula
    // the operator uses — the test controls the corpus, not the hash
    val ids = (1L to 50L)
    val train = ids.filter(bucket(_) < thr)
    val eval_ = ids.filter(bucket(_) >= thr)
    assert(train.size >= 2 && eval_.size >= 3)

    val trainText = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (train.head, trainText),                        // train corpus member
      (train(1), "completely unrelated training words here"),
      (eval_.head, trainText),                        // verbatim leak
      (eval_(1), "genuinely novel evaluation sentence nothing shared"),
      // shares the "quick brown fox" run with train but nothing else
      (eval_(2), "quick brown fox went home early tonight")
    ).toDF("doc_id", "text")

    val out = Curation.contamination(docs, "doc_id", "text", frac)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

    val (nLeak, sharedLeak, cLeak) = out(eval_.head)
    assert(nLeak == 7 && sharedLeak == 7 && cLeak == 1.0) // 9 tokens -> 7 shingles
    val (_, shared0, c0) = out(eval_(1))
    assert(shared0 == 0 && c0 == 0.0)
    val (n2, shared2, c2) = out(eval_(2))
    // only the single ("quick","brown","fox") shingle survives in train
    assert(n2 == 5 && shared2 == 1 && c2 == 1.0 / 5.0)
  }

  test("bloom-prefiltered contamination is row-identical to the exact join, even at fpp 0.5") {
    // 120 docs of overlapping token windows: plenty of partial overlap on
    // both sides of the split. fpp = 0.5 floods the prefilter with false
    // positives — the exact train-set join must kill every one of them
    // (exactness is unconditional; the Bloom only prunes the shuffle).
    val docs = (1L to 120L).map { i =>
      (i, (i to i + 12).map(j => s"w${j % 40}").mkString(" "))
    }.toDF("doc_id", "text")
    val exact = Curation.contamination(docs, "doc_id", "text", 0.5)
      .orderBy("doc_id").collect().toSeq
    for (fpp <- Seq(0.5, 0.01)) {
      val bloomed = Curation.contaminationBloom(docs, "doc_id", "text", 0.5,
          fpp = fpp)
        .orderBy("doc_id").collect().toSeq
      assert(bloomed == exact, s"fpp=$fpp diverged")
    }
  }

  test("repetition signals: exact counts on crafted docs, nulls on degenerate ones") {
    val docs = Seq(
      (1L, "x\nx\ny"),       // dup line, tokens x x y
      (2L, "a a a a"),       // one line; bigrams "a a" x3
      (3L, "solo line"),     // no dups, one bigram
      (4L, "hi"),            // no bigrams
      (5L, "")               // nothing at all
    ).toDF("doc_id", "text")

    val rows = Curation.repetitionSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect()

    val r1 = rows(0)
    assert(r1.getLong(1) == 3 && r1.getLong(2) == 1)           // 3 lines, 1 dup
    assert(r1.getDouble(3) == 1.0 / 3.0)
    assert(r1.getDouble(4) == 2.0 / 3.0)                        // both x's chars
    assert(r1.getLong(5) == 2 && r1.getLong(6) == 1)            // x-x, x-y
    assert(r1.getDouble(7) == 0.5)

    val r2 = rows(1)
    assert(r2.getLong(1) == 1 && r2.getLong(2) == 0 && r2.getDouble(3) == 0.0)
    assert(r2.getLong(5) == 3 && r2.getLong(6) == 3 && r2.getDouble(7) == 1.0)

    val r3 = rows(2)
    assert(r3.getLong(5) == 1 && r3.getLong(6) == 1 && r3.getDouble(7) == 1.0)

    val r4 = rows(3)
    assert(r4.getLong(1) == 1 && r4.getLong(5) == 0)
    assert(r4.isNullAt(6) && r4.isNullAt(7))

    val r5 = rows(4)
    assert(r5.getLong(1) == 0 && r5.getLong(2) == 0)
    assert(r5.isNullAt(3) && r5.isNullAt(4) && r5.isNullAt(6) && r5.isNullAt(7))
  }

  test("redactPii: exact counts and redacted text, chained pattern precedence") {
    val docs = Seq(
      (1L, "mail a.b+c@ex-corp.io or x_1@y.co today"),   // 2 emails
      (2L, "call 555-123-4567 or 555.987.6543 now"),     // 2 phones
      (3L, "host 10.0.0.1 and 192.168.255.3"),           // 2 ips
      (4L, "mixed u@d.org 555-111-2222 8.8.8.8"),
      (5L, "clean text with no pii at all 1234")
    ).toDF("doc_id", "text")

    val out = Curation.redactPii(docs, "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))

    assert(out(0) == ((1L, 2L, 0L, 0L, "mail <EMAIL> or <EMAIL> today")))
    assert(out(1) == ((2L, 0L, 2L, 0L, "call <PHONE> or <PHONE> now")))
    assert(out(2) == ((3L, 0L, 0L, 2L, "host <IP> and <IP>")))
    assert(out(3) == ((4L, 1L, 1L, 1L, "mixed <EMAIL> <PHONE> <IP>")))
    assert(out(4) == ((5L, 0L, 0L, 0L, "clean text with no pii at all 1234")))
  }

  test("dedupSentences: first occurrence wins globally, docs reassemble in order") {
    val docs = Seq(
      (1L, "hello world. foo bar. hello world"),  // in-doc dup of sentence 0
      (2L, "foo bar. unique two"),                // "foo bar" already owned by doc 1
      (3L, "unique three. foo bar. another one"), // middle sentence drops
      (4L, ". .")                                 // only empty sentences -> absent
    ).toDF("doc_id", "text")

    val out = Curation.dedupSentences(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    assert(out.length == 3)                       // doc 4 has nothing to clean
    assert(out(0) == ((1L, 3L, 2L, "hello world foo bar")))
    assert(out(1) == ((2L, 2L, 1L, "unique two")))
    assert(out(2) == ((3L, 3L, 2L, "unique three another one")))

    // decisions are partitioning-invariant (ordering is by (doc_id, pos),
    // not arrival order)
    val again = Curation.dedupSentences(docs.repartition(5, col("text")),
      "doc_id", "text").collect()
    assert(again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSet == out.toSet)
  }

  test("c4LineFilter: line rules with chained precedence, page flags") {
    val docs = Seq(
      // 2 prose keeps, 1 nav (no terminal punct), 1 short, 1 js notice
      (1L, "A fine full sentence here.\nHome | About\nOk.\n" +
        "Please enable javascript now.\nAnother proper prose line stays!"),
      // page with code brace: lines keep individually, page dropped
      (2L, "One good line stays here.\nif (x) { y(); }\n" +
        "Second good line stays here.\nThird good line stays here."),
      // lorem page + too few kept lines (< 3)
      (3L, "Lorem ipsum dolor sit amet.\nShort.\nMenu")
    ).toDF("doc_id", "text")
    val out = Curation.c4LineFilter(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 5 lines, kept 2; nav dropped by punct, Ok. short, js notice
    // counted by the js rule (it passes punct + words first)
    assert(out(0).getLong(1) == 5 && out(0).getLong(2) == 2)
    assert(out(0).getLong(3) == 1 && out(0).getLong(4) == 1 && out(0).getLong(5) == 1)
    assert(out(0).getString(6) ==
      "A fine full sentence here.\nAnother proper prose line stays!")
    assert(out(0).getLong(7) == 0L) // kept 2 < minKept 3 → page dropped
    // doc 2: 3 prose keeps but the brace kills the page
    assert(out(1).getLong(2) == 3 && out(1).getLong(7) == 0L)
    // doc 3: lorem page flagged regardless of its kept line
    assert(out(2).getLong(7) == 0L)
  }

  test("gopherQualityFlags: exact fractions and flag logic on crafted docs") {
    // 60 words of clean prose with stop words → keep; relaxed bounds
    // aren't needed — the doc is engineered to pass every rule
    val prose = (1 to 12).map(_ => "the cat and dog have fun").mkString(" ")
    val docs = Seq(
      (1L, prose),
      // bullet-dominated: 3 of 4 lines start with a bullet
      (2L, "- one two three\n- four five six\n* seven eight nine\n" + prose),
      // symbol-heavy: 20 hashes over ~60 words → ratio > 0.1
      (3L, prose + " " + ("# " * 20).trim),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = Curation.gopherQualityFlags(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 72 words, mean len (72*4-12)/72? hand-check the basics
    assert(out(0).getLong(1) == 72 && out(0).getLong(8) == 1L)
    assert(out(0).getDouble(6) == 1.0) // every word alphabetic
    // doc 2: bullet_frac = 3/4 (≤ 0.9 passes) — fraction exact
    assert(out(1).getDouble(4) == 0.75)
    // doc 3: 20 extra # tokens → symbol rule fails
    assert(out(2).getDouble(3) > 0.1 && out(2).getLong(8) == 0L)
    // doc 4: empty — every guarded fraction NULL, keep = 0, not a crash
    assert(out(3).getLong(1) == 0 && out(3).isNullAt(2) && out(3).getLong(8) == 0L)
  }

  test("sourceQuota: caps per source, keeps the smallest buckets, partitioning-invariant") {
    val docs = (1L to 10L).map(i =>
      (i, if (i <= 5) "sA" else "sB", s"text $i")).toDF("doc_id", "source", "text")

    val kept = Curation.sourceQuota(docs, "doc_id", "source", quota = 3)
    val bySrc = kept.collect().groupBy(_.getString(1))
    assert(bySrc("sA").length == 3 && bySrc("sB").length == 3)

    // expected: the 3 ids with smallest portable bucket per source
    def expect(ids: Seq[Long]) = ids.sortBy(i => (bucket(i), i)).take(3).toSet
    assert(bySrc("sA").map(_.getLong(0)).toSet == expect(1L to 5L))
    assert(bySrc("sB").map(_.getLong(0)).toSet == expect(6L to 10L))

    // ranks are 1..quota and deterministic under a different partitioning
    val again = Curation.sourceQuota(docs.repartition(7, col("text")),
      "doc_id", "source", quota = 3)
    assert(again.collect().toSet == kept.collect().toSet)
    assert(kept.select("rank").as[Long].collect().sorted.toSeq ==
      Seq(1L, 1L, 2L, 2L, 3L, 3L))
  }

  test("dsir weights: identity on all-target, target affinity, exact determinism") {
    // when target == corpus, every bucket ratio is exactly 1.0 (identical
    // smoothed quotients divide to 1), so importance == 1.0 bit-exactly
    val docs = Seq(
      (1L, "en", "alpha beta gamma delta"),
      (2L, "en", "alpha beta gamma"),
      (3L, "zh", "epsilon zeta"),
      (4L, "zh", "solo")
    ).toDF("doc_id", "lang", "text")
    val idW = Curation.dsirWeights(docs, "doc_id", "text", lit(true))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(idW.size == 4)
    // bigram shingles: n tokens -> n-1 terms; short docs fold to 1
    assert(idW(1L)._1 == 3 && idW(2L)._1 == 2 && idW(3L)._1 == 1 && idW(4L)._1 == 1)
    assert(idW.values.forall(_._2 == 1.0))

    // a non-target doc sharing the target's n-grams outscores one with
    // disjoint vocabulary
    val corpus = (
      (1L to 3L).map(i => (i, "en", "the cat sat on the mat")) ++ Seq(
        (4L, "zh", "the cat sat on the mat"),
        (5L, "zh", "voila un chien dans le jardin"))
    ).toDF("doc_id", "lang", "text")
    val w = Curation.dsirWeights(corpus, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(4L) > w(5L), s"target-affine doc must outscore: $w")
    assert(w(4L) == w(1L), "identical text scores identically")

    // the bucket-sorted fold makes the double partitioning-invariant
    val a = Curation.dsirWeights(corpus, "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Curation.dsirWeights(corpus.repartition(7), "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
