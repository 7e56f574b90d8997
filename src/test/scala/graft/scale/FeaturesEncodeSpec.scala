package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the categorical target-statistic encoders (q184/q185) against
  * literal driver replays — Laplace-adjusted WOE/IV and leave-one-out
  * target encoding — and the q175 chi² degenerate-denominator guard.
  * Rounding replays Spark's ROUND (BigDecimal HALF_UP), which matters
  * for negative WOE values where math.round would disagree.
  */
class FeaturesEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("woeEncoding == driver replay (Laplace +1, round-6)") {
    val rnd = new scala.util.Random(184)
    val rows = (1 to 400).map { _ =>
      val b = s"b${rnd.nextInt(6)}"
      // different positive rates per bucket so WOE spans both signs
      val y = if (rnd.nextInt(100) < 20 + 12 * (b.last - '0')) 1L else 0L
      (b, y)
    }
    val got = Features.woeEncoding(rows.toDF("b", "y"), col("b"), col("y"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val cells = rows.groupBy(_._1).map { case (b, rs) =>
      (b, rs.count(_._2 == 1L).toLong, rs.count(_._2 == 0L).toLong)
    }.toSeq
    val pt = cells.map(_._2).sum
    val nt = cells.map(_._3).sum
    val nb = cells.size
    assert(got.size == nb)
    cells.foreach { case (b, pos, neg) =>
      val pr = (pos + 1).toDouble / (pt + nb)
      val nr = (neg + 1).toDouble / (nt + nb)
      val woe = math.log(pr / nr)
      assert(got(b) == ((pos, neg, r6(woe), r6((pr - nr) * woe))),
        s"bucket $b")
    }
  }

  test("woeEncoding: one-sided buckets stay finite under Laplace") {
    val df = Seq(("allpos", 1L), ("allpos", 1L), ("allneg", 0L),
      ("allneg", 0L), ("mix", 1L), ("mix", 0L)).toDF("b", "y")
    val got = Features.woeEncoding(df, col("b"), col("y")).collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite,
        s"woe finite for ${r.getString(0)}")
      assert(!r.getDouble(4).isNaN && !r.getDouble(4).isInfinite,
        s"iv_term finite for ${r.getString(0)}")
    }
  }

  test("looTargetEncode == driver replay; own label excluded") {
    val rnd = new scala.util.Random(185)
    val rows = (1L to 300L).map { i =>
      (i, s"b${rnd.nextInt(5)}", rnd.nextInt(2).toLong)
    }
    val m = 10L
    val got = Features.looTargetEncode(rows.toDF("id", "b", "y"),
        col("id"), col("b"), col("y"), m)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val per = rows.groupBy(_._2).map { case (b, rs) =>
      b -> ((rs.map(_._3).sum, rs.size.toLong))
    }
    val pt = per.values.map(_._1).sum
    val n = per.values.map(_._2).sum
    rows.foreach { case (id, b, y) =>
      val (sy, nb) = per(b)
      val te = ((sy - y).toDouble + m.toDouble * pt.toDouble / n.toDouble) /
        ((nb - 1).toDouble + m.toDouble)
      assert(got(id) == r6(te), s"id $id")
    }
  }

  test("looTargetEncode: singleton bucket falls back to smoothed prior") {
    val df = Seq((1L, "solo", 1L), (2L, "big", 0L), (3L, "big", 1L),
      (4L, "big", 0L)).toDF("id", "b", "y")
    val got = Features.looTargetEncode(df, col("id"), col("b"), col("y"),
        m = 10L)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // solo bucket: (1 - 1 + 10*(2/4)) / (0 + 10) = exactly the prior 0.5
    assert(got(1L) == 0.5)
  }

  test("chiSquareTerms: universal term and single-label corpus score 0") {
    val docs = Seq(
      (1L, "en", "the apple fruit"), (2L, "en", "the apple juice"),
      (3L, "de", "the apfel obst"), (4L, "de", "the apfel saft"))
      .toDF("id", "lbl", "text")
    val got = Eval.chiSquareTerms(docs, col("lbl"), col("id"), col("text"),
      topK = 10, minDf = 1L).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(!r.getDouble(5).isNaN,
      s"chi2 NaN for term ${r.getString(2)}"))
    // "the" appears in every doc (tf == n_docs): zero association signal
    got.filter(_.getString(2) == "the")
      .foreach(r => assert(r.getDouble(5) == 0.0))
    // discriminative terms must outrank it
    assert(got.filter(_.getLong(1) == 1L)
      .forall(r => r.getString(2) != "the"))

    val single = Seq((1L, "en", "a b"), (2L, "en", "a c"))
      .toDF("id", "lbl", "text")
    Eval.chiSquareTerms(single, col("lbl"), col("id"), col("text"),
        topK = 10, minDf = 1L)
      .collect()
      .foreach(r => assert(r.getDouble(5) == 0.0,
        s"single-label chi2 must be 0, got ${r.getDouble(5)}"))
  }
}
