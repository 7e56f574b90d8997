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

  /** Isotonic calibration of a [0, 1) model score against binary labels
    * — the "my probe's scores aren't probabilities" fix (Zadrozny &
    * Elkan's binning + isotonic regression), computed by the CLOSED
    * minimax formula instead of the iterative PAVA loop:
    *
    *   rate_iso(i) = max_{j≤i} min_{k≥i} (Σ labels in bins j..k) /
    *                                      (Σ rows in bins j..k)
    *
    * which is the exact isotonic-regression solution and — unlike PAVA's
    * data-dependent pooling — a fixed expression tree both engines walk
    * identically (q168 hash-certifies every calibrated rate).
    *
    * Scale shape: the ONLY corpus-sized work is one map-side-combinable
    * (bin, n, positives) aggregate; everything after runs on the ≤ bins
    * rows — prefix sums via a tiny single-partition window (bounded by
    * `bins`, never by data) and a bins×pairs grid join (≤ bins³ tiny
    * rows). Calibrated rates are monotone by construction; raw and
    * calibrated rates are emitted rounded 6 alongside the exact integer
    * evidence (n, positives).
    *
    * Returns (bin, n, pos, rate_raw, rate_iso) for every NON-EMPTY bin,
    * ordered by bin. Scores outside [0, 1) clamp into the edge bins.
    */
  def isotonicCalibrate(df: DataFrame, scoreCol: Column, labelCol: Column,
      bins: Int = 20): DataFrame = {
    require(bins >= 1 && bins <= 64, s"bins in [1, 64]: $bins")
    import org.apache.spark.sql.expressions.Window
    val bin = least(greatest(
      floor(scoreCol.cast("double") * bins).cast("long"), lit(0L)),
      lit((bins - 1).toLong))
    val base = df.select(bin.as("bin"),
        labelCol.cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
    val wp = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = base
      .withColumn("cn", sum(col("n")).over(wp))
      .withColumn("cp", sum(col("pos")).over(wp))
    // interval means over prefix sums: avg(j..k) = (cp_k − cp_{j−1}) /
    // (cn_k − cn_{j−1}); the "before j" prefix is (cn_j − n_j, cp_j − pos_j)
    val k = pre.select(col("bin").as("kb"), col("cn").as("kn"),
      col("cp").as("kp"))
    val jFull = pre.select(col("bin").as("jb"),
      (col("cn") - col("n")).as("jn0"), (col("cp") - col("pos")).as("jp0"))
    val grid = jFull.join(k, col("jb") <= col("kb"))
      .select(col("jb"), col("kb"),
        ((col("kp") - col("jp0")).cast("double") /
          (col("kn") - col("jn0")).cast("double")).as("avg"))
    val ident = pre.select(col("bin").as("ib"))
    val minOverK = ident.join(grid, col("jb") <= col("ib") &&
        col("kb") >= col("ib"))
      .groupBy(col("ib"), col("jb"))
      .agg(min(col("avg")).as("mn"))
      .groupBy(col("ib"))
      .agg(max(col("mn")).as("iso"))
    base.join(minOverK, col("bin") === col("ib"))
      .select(col("bin"), col("n"), col("pos"),
        round(col("pos").cast("double") / col("n").cast("double"), 6)
          .as("rate_raw"),
        round(col("iso"), 6).as("rate_iso"))
  }
}
