package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The two curation skew fallbacks vs their plain paths on the fixtures
  * that motivate them: a sentence repeated 10^5 times (one hot window
  * partition) and one mega-source holding ~99% of the corpus (one fat
  * sort partition). Forcing the cut to 0 bytes selects the skew path;
  * Long.MaxValue selects the plain path; results must be identical row
  * for row — the cut may change the plan, never the answer.
  */
class CurationSkewSpec extends SparkSpec {

  import spark.implicits._

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("dedupSentences: two-stage == window on a 1e5-occurrence sentence") {
    // every doc repeats the boilerplate sentence; one unique sentence per
    // doc decides reassembly order handling
    val docs = (1L to 100000L)
      .map(i => (i, s"SHARED BOILERPLATE FOOTER. unique payload $i"))
      .toDF("doc_id", "text")
    val win = Curation.dedupSentences(docs, "doc_id", "text",
      twoStageBytes = Long.MaxValue).orderBy("doc_id")
    val two = Curation.dedupSentences(docs, "doc_id", "text",
      twoStageBytes = 0L).orderBy("doc_id")
    val w = rows(win)
    assert(w == rows(two))
    assert(w.size == 100000)
    // the hot sentence survives exactly once, in doc 1
    val kept = win.filter($"n_kept" === 2).collect()
    assert(kept.length == 1 && kept.head.getLong(0) == 1L)
  }

  test("skew paths plan the shapes that make them safe") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, s"alpha beta. gamma $i", "src"))
      .toDF("doc_id", "text", "source")
    // two-stage dedup: the keep decision must be a partial-aggregable
    // min, not a window (a window partition cannot be split by AQE)
    val p65 = Curation.dedupSentences(docs, "doc_id", "text",
      twoStageBytes = 0L).queryExecution.executedPlan.toString
    assert(!p65.contains("Window"), p65)
    assert(p65.contains("partial_min") || p65.contains("partial min")
      || p65.contains("min("), p65)
    // TopK quota: the kept set must come from the custom heap operator
    // (whose partial bounds each source per partition); the surviving
    // window only ranks <= quota rows per source
    val p66 = Curation.sourceQuota(docs, "doc_id", "source", quota = 10,
      combinerBytes = 0L).queryExecution.executedPlan.toString
    assert(p66.contains("TopKPerGroup"), p66)
  }

  test("sourceQuota: TopK combiner == window under one mega-source") {
    val mega = (1L to 99000L).map(i => (i, "mega-source"))
    val tail = (99001L to 100000L).map(i => (i, s"site-${i % 10}"))
    val docs = (mega ++ tail).toDF("doc_id", "source")
    val win = Curation.sourceQuota(docs, "doc_id", "source", quota = 10,
      combinerBytes = Long.MaxValue)
    val topk = Curation.sourceQuota(docs, "doc_id", "source", quota = 10,
      combinerBytes = 0L)
    val w = rows(win)
    assert(w == rows(topk))
    // 11 sources × quota 10, every source saturated
    assert(w.size == 110)
  }
}
