package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear probes over embedding columns — the "train a tiny supervised
  * scorer, then score the whole corpus" pattern quality-filtering
  * pipelines run (a ridge/logistic head on frozen embeddings deciding
  * what survives the crawl). The distributed shape is the q101 one:
  * the corpus-sized work is ONE map-side-combined aggregation pass
  * building the d×d normal-equation moments (d²+d doubles of state —
  * nothing row-count-sized anywhere), the solve is driver arithmetic on
  * the ROUNDED moments, and scoring is a broadcast-weights narrow
  * projection. 100 TB changes none of it.
  *
  * Determinism (oracle-replayable): moment sums round to `roundDp`
  * (the q101 contract — partial-sum wobble lives below the round), the
  * ridge term is added AFTER rounding, and the driver solve is Cramer's
  * rule with a PINNED expansion order (first-row Laplace, signed terms
  * folded left to right) — the same fixed IEEE expression tree the q145
  * oracle evaluates in SQL, so weights and scores are bit-identical
  * across engines. Cramer is O(d!) and numerically naive, which is FINE
  * here and only here: probes are d ≤ 4 by contract (features + an
  * intercept). Wider heads need a pivoting solver whose branch order is
  * data-dependent — not replayable in portable SQL — so this module
  * refuses them rather than shipping an uncertifiable path.
  */
object Probe {

  /** Determinant by first-row Laplace expansion, signed terms folded
    * left to right — the pinned order the oracle SQL mirrors.
    */
  def det(m: Vector[Vector[Double]]): Double = m.length match {
    case 1 => m(0)(0)
    case n =>
      (0 until n).map { j =>
        val minor = m.tail.map(row => row.patch(j, Nil, 1))
        val term = m(0)(j) * det(minor)
        if (j % 2 == 0) term else -term
      }.reduceLeft(_ + _)
  }

  /** Train ridge weights on `featCols` plus an implicit trailing
    * intercept: w = (XᵀX + λI)⁻¹ Xᵀy via Cramer on the rounded moments.
    * Returns d = featCols.length + 1 weights, intercept LAST. One
    * aggregation job; the driver sees d² + d doubles.
    */
  def ridgeTrain(df: DataFrame, featCols: Seq[Column], labelCol: Column,
      lambda: Double, roundDp: Int = 6): Array[Double] = {
    val d = featCols.length + 1
    require(d >= 2 && d <= 4,
      s"probe width $d out of the certifiable range [2, 4] " +
        "(wider solves need data-dependent pivoting - see scaladoc)")
    val xs = featCols.map(_.cast("double")) :+ lit(1.0)
    val y = labelCol.cast("double")
    val aggs =
      (for { i <- 0 until d; j <- i until d }
        yield sum(xs(i) * xs(j)).as(s"a_${i}_$j")) ++
        (0 until d).map(i => sum(xs(i) * y).as(s"b_$i"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    def rnd(x: Double): Double = {
      // BigDecimal.decimal (Double.toString-based), NOT the exact-binary
      // constructor: this is what Spark's round() does, and the DuckDB
      // parity of the whole suite is calibrated against it
      val r = BigDecimal.decimal(x)
        .setScale(roundDp, BigDecimal.RoundingMode.HALF_UP).toDouble
      r + 0.0 // collapse -0.0, the q101 rule
    }
    val a = Array.tabulate(d, d) { (i, j) =>
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      val base = rnd(row.getDouble(row.fieldIndex(s"a_${lo}_$hi")))
      if (i == j) base + lambda else base
    }
    val b = Array.tabulate(d)(i => rnd(row.getDouble(row.fieldIndex(s"b_$i"))))
    val am = a.map(_.toVector).toVector
    val detA = det(am)
    require(detA != 0.0, "singular normal equations (degenerate features)")
    Array.tabulate(d) { i =>
      det(am.indices.map(r => am(r).updated(i, b(r))).toVector) / detA
    }
  }

  /** The broadcast-weights scoring expression: Σ wᵢ·xᵢ + w_last, summed
    * left to right, rounded to `roundDp`.
    */
  def scoreExpr(featCols: Seq[Column], w: Array[Double],
      roundDp: Int = 6): Column = {
    require(w.length == featCols.length + 1, "weights = features + intercept")
    val terms = featCols.zip(w.toIndexedSeq).map { case (c, wi) =>
      c.cast("double") * lit(wi)
    } :+ lit(w.last)
    round(terms.reduceLeft(_ + _), roundDp)
  }
}
