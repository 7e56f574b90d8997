package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-11 eval additions against literal driver replays:
  * the tie-aware fractional lift table (q187), integer-pico-unit
  * mutual-information term ranking (q188), the hashing-trick
  * vectorizer (q189), and held-out NB scoring with genuine OOV
  * tokens (q186). Rounding replays Spark's ROUND (BigDecimal
  * HALF_UP) exactly, including for negative cell terms.
  */
class EvalLiftSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def rU(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("liftTable == driver replay; bucket B recovers all positives") {
    val rnd = new scala.util.Random(187)
    val buckets = 10
    val rows = (1 to 700).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val u = rnd.nextInt(25).toLong // few units -> heavy ties
      val y = if (rnd.nextInt(25) < u) 1L else 0L
      (g, u, y)
    }
    val got = Eval.liftTable(rows.toDF("g", "u", "y"),
        col("g"), col("u"), col("y"), buckets)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))))
      .toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val cont = rs.groupBy(_._2).map { case (u, xs) =>
        (u, xs.size.toLong, xs.count(_._3 == 1L).toLong)
      }.toSeq.sortBy(-_._1)
      val nn = cont.map(_._2).sum
      val np = cont.map(_._3).sum
      (1 to buckets).foreach { k =>
        var rowsAbove = 0L
        var posAbove = 0L
        var cum = Double.NaN
        cont.foreach { case (_, n, pos) =>
          if (cum.isNaN && rowsAbove * buckets < k * nn &&
              k * nn <= (rowsAbove + n) * buckets) {
            val mB = k * nn - rowsAbove * buckets
            cum = posAbove.toDouble +
              mB.toDouble * pos.toDouble / (buckets.toDouble * n.toDouble)
          }
          rowsAbove += n; posAbove += pos
        }
        assert(got((g, k.toLong)) == ((nn, np, r6(cum),
          r6(cum / np.toDouble),
          r6(cum * buckets.toDouble / (np.toDouble * k.toDouble)))),
          s"group $g bucket $k")
      }
      // the final cut takes everything: gain exactly 1, lift exactly 1
      assert(got((g, buckets.toLong))._3 == np.toDouble)
    }
  }

  test("mutualInfoTerms == driver replay with pico-unit cell sums") {
    val docs = Seq(
      (1L, "en", "the cat runs home"), (2L, "en", "the cat sat"),
      (3L, "en", "the dog runs"), (4L, "fr", "the chat dort"),
      (5L, "fr", "the chien court vite"), (6L, "fr", "the chat mange"),
      (7L, "de", "the katze schläft"), (8L, "de", "the hund rennt"))
    val topK = 5
    val minDf = 1L
    val got = Eval.mutualInfoTerms(docs.toDF("id", "lbl", "text"),
        col("lbl"), col("id"), col("text"), topK, minDf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // driver replay
    val pres = docs.flatMap { case (id, l, t) =>
      t.split("\\s+").filter(_.nonEmpty).distinct.map(term => (l, id, term))
    }.distinct
    val lt = pres.groupBy(p => (p._1, p._3)).map { case (k, v) =>
      k -> v.size.toLong
    }
    val tf = lt.groupBy(_._1._2).map { case (t, v) => t -> v.values.sum }
      .filter(_._2 >= minDf)
    val sizes = docs.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
    val n = docs.size.toLong
    def cellU(cnt: Long, rowm: Long, colm: Long): Long =
      if (cnt > 0)
        rU(1.0e12 * (cnt.toDouble / n.toDouble) *
          math.log(n.toDouble * cnt.toDouble /
            (rowm.toDouble * colm.toDouble)))
      else 0L
    val scored = lt.collect { case ((l, t), a) if tf.contains(t) =>
      val tfv = tf(t); val nl = sizes(l)
      val miU = cellU(a, tfv, nl) + cellU(nl - a, n - tfv, nl) +
        cellU(tfv - a, tfv, n - nl) +
        cellU(n - nl - tfv + a, n - tfv, n - nl)
      (l, t, a, tfv, miU)
    }.toSeq
    scored.groupBy(_._1).foreach { case (l, terms) =>
      terms.sortBy(x => (-x._5, x._2)).take(topK).zipWithIndex.foreach {
        case ((_, t, a, tfv, miU), i) =>
          assert(got((l, (i + 1).toLong)) ==
            ((t, a, tfv, r6(miU.toDouble / 1.0e12))), s"label $l pos ${i + 1}")
      }
    }
  }

  test("featureHash == driver replay over portableHash62") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "beta beta delta"),
      (3L, ""), (4L, "epsilon"))
    val dim = 64
    val got = TextOps.featureHash(docs.toDF("id", "text"),
        col("id"), col("text"), dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val want = docs.flatMap { case (id, t) =>
      t.split("\\s+").filter(_.nonEmpty).map { tok =>
        val h = graft.functions.NativeExpressions.portableHash62(
          UTF8String.fromString(tok))
        (id, h % dim, 1L - 2L * ((h >> 31) & 1L))
      }
    }.groupBy(x => (x._1, x._2))
      .map { case (k, v) => k -> v.map(_._3).sum }
      .filter(_._2 != 0L)
    assert(got == want)
    assert(!got.keySet.exists(_._1 == 3L)) // empty doc: no entries
  }

  test("naiveBayesScore: held-out split with OOV-heavy and all-OOV docs") {
    val train = Seq(
      (2L, "en", "the cat runs the cat sat the dog barks"),
      (4L, "en", "the house is blue the dog runs"),
      (6L, "fr", "le chat dort le chien court le chat mange"),
      (8L, "fr", "la maison est bleue le chien dort"),
      (10L, "fr", "le taxi roule vite"))
    val score = Seq(
      (1L, "en", "the cat runs"), // in-vocab english
      (3L, "fr", "le chat court"), // in-vocab french
      (5L, "en", "zzz qqq xxx"), // all OOV -> prior argmax (fr: 3 > 2)
      (7L, "en", "the dog zzz qqq xxx yyy www")) // OOV-heavy but evidence en
    val got = Classify.naiveBayesScore(
        train.toDF("id", "lbl", "text"), score.toDF("id", "lbl", "text"),
        col("id"), col("lbl"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(3L) == "fr")
    // all-OOV: every class scores prior - ntok*base; fr has the larger
    // prior AND the larger vocab mass denominator — replay decides
    val U = 1000000L
    def lnU(x: Long): Long = math.round(U.toDouble * math.log(x.toDouble))
    val vocab = train.flatMap(_._3.split("\\s+")).distinct.size.toLong
    val byL = train.groupBy(_._2)
    val sc5 = byL.map { case (l, ds) =>
      val tl = ds.flatMap(_._3.split("\\s+").filter(_.nonEmpty)).size.toLong
      val prior = lnU(ds.size.toLong) - lnU(train.size.toLong)
      l -> (prior - 3L * lnU(tl + vocab))
    }
    val want5 = sc5.toSeq.sortBy { case (l, s) => (-s, l) }.head._1
    assert(got(5L) == want5)
    assert(got(7L) == "en") // "the dog" evidence survives 5 OOV tokens
    // confusion matrix totals match the scored frame
    val conf = Classify.naiveBayesHeldOutConfusion(
        train.toDF("id", "lbl", "text"), score.toDF("id", "lbl", "text"),
        col("id"), col("lbl"), col("text"))
      .collect().map(r => r.getLong(2)).sum
    assert(conf == score.size.toLong)
  }
}
