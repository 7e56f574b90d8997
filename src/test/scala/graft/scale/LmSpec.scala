package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins interpolated KN against a driver-side replay of the exact model
  * (same counts, same canonical expression shape, same micro-unit
  * quantization) and the smoothing sanity properties.
  */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private def replay(train: Seq[String], eval: Seq[(String, String)])
      : Map[String, (Long, Long, Long)] = {
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    def bigs(t: String) = { val ts = toks(t); ts.zip(ts.drop(1)) }
    val cb = train.flatMap(bigs).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val c1 = cb.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val n1f = cb.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val n1b = cb.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val tt = cb.size.toLong
    val v = train.flatMap(toks).distinct.length.toLong
    def prob(w1: String, w2: String): Double = {
      val pc = (n1b.getOrElse(w2, 0L) + 1).toDouble / (tt + v + 1).toDouble
      c1.get(w1) match {
        case Some(c) =>
          math.max(cb.getOrElse((w1, w2), 0L).toDouble - 0.75, 0.0) /
            c.toDouble +
            (0.75 * n1f(w1).toDouble / c.toDouble) * pc
        case None => pc
      }
    }
    eval.groupBy(_._1).map { case (src, ds) =>
      val bs = ds.flatMap(d => bigs(d._2))
      val nOov = bs.count(b => !n1b.contains(b._2)).toLong
      val nll = bs.map { case (w1, w2) =>
        -math.round(1000000.0 * math.log(prob(w1, w2)))
      }.sum
      src -> ((bs.length.toLong, nOov, nll))
    }
  }

  test("knBigramCrossEntropy == driver-side KN model replay") {
    val rnd = new scala.util.Random(182)
    val words = Seq("a", "b", "c", "d", "e", "f", "g")
    def doc() = (1 to rnd.nextInt(12) + 2)
      .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    val train = (1 to 40).map(_ => doc())
    val eval = (1 to 30).map(i =>
      (s"s${i % 3}", if (i % 7 == 0) doc() + " zzz unseen" else doc()))
    val got = Lm.knBigramCrossEntropy(
        train.toDF("text"), eval.toDF("src", "text"),
        col("src"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == replay(train, eval))
  }

  test("knBigramCrossEntropy: seen text scores better than shuffled text") {
    val train = (1 to 20).map(_ => "the quick brown fox jumps over the lazy dog")
    val eval = Seq(("seen", "the quick brown fox jumps"),
      ("scrambled", "dog the over fox quick"))
    val got = Lm.knBigramCrossEntropy(train.toDF("text"),
        eval.toDF("src", "text"), col("src"), col("text"))
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got("seen") < got("scrambled"))
  }

  test("knBigramCrossEntropy: OOV continuations counted and finite") {
    val train = Seq("a b a b a b").toDF("text")
    val eval = Seq(("s", "a b q q")).toDF("src", "text")
    val r = Lm.knBigramCrossEntropy(train, eval, col("src"), col("text"))
      .collect().head
    assert(r.getLong(1) == 3L) // a-b, b-q, q-q
    assert(r.getLong(2) == 2L) // q never continues anything in train
    assert(!r.isNullAt(4) && r.getDouble(4) > 0.0)
  }
}
