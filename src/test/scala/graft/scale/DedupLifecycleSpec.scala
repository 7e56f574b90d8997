package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage-lifecycle contract for the pair-generator family (the r6
  * review's "library callers leak storage" item): none of the dedup pair
  * operators may leave anything registered in the block manager after
  * their action completes. They achieve that by having NO persist at all
  * — each multi-consumer intermediate is materialized as ONE explicit
  * exchange whose shuffle files every consumer branch reuses
  * (ReusedExchange / the AQE stage cache), so the text/embedding kernel
  * still runs exactly once per action.
  *
  * `connectedComponents` is also covered on its local path (its probe
  * persist must be released by the operator's own try/finally); the
  * distributed path is exempt by design — its per-round localCheckpoints
  * are released by the ContextCleaner when the returned frame is dropped,
  * which is asynchronous and not assertable here.
  */
class DedupLifecycleSpec extends SparkSpec {

  private def newlyPersisted[A](body: => A): Set[Int] = {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    body
    spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
  }

  private def docs: DataFrame = {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
    ((1L, base) :: (2L, near) :: (3 to 40).map(i =>
      (i.toLong, (i to i + 50).map(j => s"w${i}_$j").mkString(" "))).toList)
      .toDF("doc_id", "text")
  }

  private def vecs: DataFrame = {
    import spark.implicits._
    (1 to 30).map { i =>
      val v = Array.tabulate(8)(d => math.sin(i * 0.7 + d).toFloat)
      (i.toLong, v)
    }.toDF("id", "vec")
  }

  test("minhashDupPairs leaves no persisted RDDs behind") {
    val leaked = newlyPersisted {
      Dedup.minhashDupPairs(docs, "doc_id", "text", threshold = 0.6).count()
    }
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
  }

  test("simhashDupPairs leaves no persisted RDDs behind") {
    val leaked = newlyPersisted {
      Dedup.simhashDupPairs(docs, "doc_id", "text", maxHamming = 3).count()
    }
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
  }

  test("commonRunPairs leaves no persisted RDDs behind") {
    val leaked = newlyPersisted {
      Dedup.commonRunPairs(docs, "doc_id", "text", k = 8, w = 4).count()
    }
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
  }

  test("embeddingDupPairs leaves no persisted RDDs behind") {
    val leaked = newlyPersisted {
      Dedup.embeddingDupPairs(vecs, "id", "vec", dim = 8, threshold = 0.9).count()
    }
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
  }

  test("semanticDedup leaves no persisted RDDs behind") {
    import spark.implicits._
    val centroids = Seq(
      Seq.tabulate(8)(d => math.sin(0.3 + d)),
      Seq.tabulate(8)(d => math.sin(2.1 + d)))
    val leaked = newlyPersisted {
      Dedup.semanticDedup(vecs, "id", "vec", centroids, threshold = 0.95).count()
    }
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
  }

  test("connectedComponents (local path) releases its probe persist") {
    import spark.implicits._
    val ids = (1L to 50L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val leaked = newlyPersisted {
      Dedup.connectedComponents(ids, pairs).count()
    }
    assert(leaked.isEmpty, s"leaked persisted RDD ids: $leaked")
  }

  private def indexRows(df: DataFrame): Seq[(Long, Seq[Long], Seq[Long])] =
    df.orderBy("id").collect().toSeq.map(r =>
      (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))

  test("minhashIndexMerge(index(old), batch) == index(old union batch), bit for bit") {
    val old = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    val merged = Dedup.minhashIndexMerge(
      Dedup.minhashIndex(old, "doc_id", "text"), batch, "doc_id", "text")
    val rebuilt = Dedup.minhashIndex(docs, "doc_id", "text")
    assert(indexRows(merged) === indexRows(rebuilt))
  }

  test("minhashIndexMerge: batch wins on id collision (re-ingest replaces)") {
    import spark.implicits._
    val old = Seq((1L, "alpha beta gamma delta"), (2L, "one two three four"))
      .toDF("doc_id", "text")
    // doc 2 re-ingested with NEW text, doc 3 brand new
    val batch = Seq((2L, "five six seven eight"), (3L, "nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val merged = Dedup.minhashIndexMerge(
      Dedup.minhashIndex(old, "doc_id", "text"), batch, "doc_id", "text")
    val expected = Dedup.minhashIndex(
      Seq((1L, "alpha beta gamma delta"), (2L, "five six seven eight"),
        (3L, "nine ten eleven twelve")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(indexRows(merged) === indexRows(expected))
  }
}
