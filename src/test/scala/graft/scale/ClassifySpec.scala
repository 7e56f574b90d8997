package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins multinomial NB against a driver-side replay of the exact
  * micro-unit model (same quantization, same int64 score algebra, same
  * argmax tiebreak) plus the separability sanity property.
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def replay(docs: Seq[(Long, String, String)])
      : Map[Long, (String, String)] = {
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val U = 1000000L
    def lnU(x: Long): Long = math.round(U.toDouble * math.log(x.toDouble))
    val byClass = docs.groupBy(_._2)
    val classTerm = byClass.map { case (l, ds) =>
      l -> ds.flatMap(d => toks(d._3)).groupBy(identity)
        .map { case (t, ts) => t -> ts.length.toLong }
    }
    val vocab = classTerm.values.flatMap(_.keys).toSet.size.toLong
    val nTot = docs.length.toLong
    val labels = byClass.keys.toSeq.sorted
    val stats = labels.map { l =>
      val tl = classTerm(l).values.sum
      l -> ((lnU(tl + vocab), lnU(byClass(l).length.toLong) - lnU(nTot)))
    }.toMap
    docs.map { case (id, truth, text) =>
      val tc = toks(text).groupBy(identity)
        .map { case (t, ts) => t -> ts.length.toLong }
      val ntok = tc.values.sum
      val scores = labels.map { l =>
        val (baseU, priorU) = stats(l)
        val s = tc.map { case (t, n) =>
          n * classTerm(l).get(t).map(c => lnU(c + 1)).getOrElse(0L)
        }.sum
        l -> (priorU + s - ntok * baseU)
      }
      val best = scores.sortBy { case (l, s) => (-s, l) }.head._1
      id -> ((truth, best))
    }.toMap
  }

  test("naiveBayes == driver-side micro-unit replay on a mixed corpus") {
    val rnd = new scala.util.Random(177)
    val enWords = Seq("the", "cat", "dog", "house", "runs", "blue")
    val frWords = Seq("le", "chat", "chien", "maison", "court", "bleu")
    val shared = Seq("taxi", "piano", "radio")
    def doc(ws: Seq[String]) =
      (1 to rnd.nextInt(10) + 3)
        .map(_ => if (rnd.nextInt(10) < 7) ws(rnd.nextInt(ws.length))
          else shared(rnd.nextInt(shared.length)))
        .mkString(" ")
    val docs = (0 until 60).map { i =>
      if (i % 2 == 0) (i.toLong, "en", doc(enWords))
      else (i.toLong, "fr", doc(frWords))
    }
    val got = Classify.naiveBayes(docs.toDF("id", "lbl", "text"),
        col("id"), col("lbl"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2)))).toMap
    assert(got == replay(docs))
  }

  test("naiveBayesConfusion: separable vocab gives a diagonal matrix") {
    val docs = Seq(
      (1L, "a", "x x y"), (2L, "a", "x y y x"), (3L, "a", "y x"),
      (4L, "b", "u u w"), (5L, "b", "w u"), (6L, "b", "u w w u"))
      .toDF("id", "lbl", "text")
    val got = Classify.naiveBayesConfusion(docs, col("id"), col("lbl"),
        col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("a", "a") -> 3L, ("b", "b") -> 3L))
  }
}
