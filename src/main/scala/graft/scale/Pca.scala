package graft.scale

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** PCA TRAINING over an embedding column — the missing half of the
  * reference's PCA story the same way [[Clustering]] is for KMeans: the
  * reference only APPLIES a pre-trained sklearn PCA
  * (`pca_14components.joblib`, mirrored by `ml.Scorer`), while
  * corpus-curation pipelines need components trained on the corpus.
  *
  * Decomposition of the work by where it belongs:
  *   - the only corpus-sized computation is the d×d covariance matrix —
  *     distributed here as ONE aggregation pass whose shuffle is bounded
  *     by `parts × d(d+1)/2` partial sums (map-side combine collapses the
  *     per-row outer products; nothing proportional to the corpus
  *     shuffles). For d = 64 that is 2080 doubles per partition.
  *   - the eigendecomposition is O(d³) on a d×d symmetric matrix — driver
  *     arithmetic, corpus-size-independent, implemented as deterministic
  *     cyclic Jacobi (no library dependency, no RNG).
  *
  * Determinism: covariance entries are rounded to `roundDp` decimals
  * before the (driver-side, sequential, fixed-sweep-order) Jacobi, so the
  * trained components depend only on the rounded matrix, not on partial-
  * aggregation order; eigenvector sign is pinned (largest-|component|
  * coordinate made positive, first index on ties).
  */
object Pca {

  /** Sample covariance of the vector column as (i, j, cov) rows, i ≤ j,
    * 0-based, cov rounded to `roundDp`. One aggregation pass: per-row
    * outer-product terms explode to d(d+1)/2 (i, j, x_i·x_j) rows that
    * partial-aggregate BEFORE the shuffle, plus the d per-dimension sums
    * for the mean correction — cov(i,j) = (Σx_i x_j − n·m_i·m_j)/(n−1).
    */
  def covarianceMatrix(corpus: DataFrame, vecCol: String,
      roundDp: Int = 6): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val par = graft.core.Par.ensure(corpus)
    // pairs (i ≤ j) generated per row via a nested transform+flatten —
    // a pure narrow generator feeding the hash aggregate's combiner
    val pairTerms = par.select(v.as("__v"))
      .select(explode(flatten(transform(col("__v"),
        (xi, i) => transform(slice(col("__v"), i + 1, size(col("__v"))),
          (xj, j) => struct(i.as("i"), (i + j).as("j"),
            (xi * xj).as("xx")))))).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.xx")).as("sxx"), count(lit(1)).as("n"))
    val dimSums = par.select(v.as("__v"))
      .select(posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(sum(col("x")).as("sx"))
    pairTerms
      .join(dimSums.select(col("pos").as("i"), col("sx").as("sx_i")), "i")
      .join(dimSums.select(col("pos").as("j"), col("sx").as("sx_j")), "j")
      .select(col("i"), col("j"),
        // + 0.0 collapses IEEE −0.0 (a cov rounding to zero from below)
        // to +0.0 — engines disagree on rendering the sign of zero
        (round((col("sxx") - col("sx_i") * col("sx_j") / col("n")) /
          (col("n") - 1), roundDp) + lit(0.0)).as("cov"))
  }

  /** Collect the (i, j, cov) frame into a dense symmetric d×d matrix. */
  def collectMatrix(cov: DataFrame): Array[Array[Double]] = {
    val rows = cov.select("i", "j", "cov").collect()
    val d = rows.iterator.map(r => math.max(r.getInt(0), r.getInt(1))).max + 1
    val m = Array.ofDim[Double](d, d)
    rows.foreach { case Row(i: Int, j: Int, c: Double) =>
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric matrix:
    * fixed (p < q) sweep order, rotations until off-diagonal mass <
    * `tol`. Returns (eigenvalues, eigenvectors-as-rows) sorted by
    * eigenvalue DESC (ties by first pivot order), each vector
    * sign-pinned: its largest-|x| coordinate (first index on ties) is
    * made non-negative — removing the inherent ±v ambiguity so trained
    * components are reproducible.
    */
  def jacobiEigen(a0: Array[Array[Double]], tol: Double = 1e-12,
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val vmat = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var p = 0
      while (p < d) { var q = p + 1; while (q < d) { s += a(p)(q) * a(p)(q); q += 1 }; p += 1 }
      s
    }
    var sweep = 0
    while (off() > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > tol / (d * d)) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // theta = 0 (equal diagonals) still needs the full 45° rotation
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = vmat(k)(p); val vkq = vmat(k)(q)
              vmat(k)(p) = c * vkp - s * vkq
              vmat(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val eigvals = order.map(i => a(i)(i)).toArray
    val eigvecs = order.map { i =>
      val vcol = Array.tabulate(d)(k => vmat(k)(i))
      // sign pin: largest-|x| coordinate (first on ties) non-negative
      var best = 0
      var k = 1
      while (k < d) { if (math.abs(vcol(k)) > math.abs(vcol(best))) best = k; k += 1 }
      if (vcol(best) < 0) vcol.map(x => -x) else vcol
    }.toArray
    (eigvals, eigvecs)
  }

  /** Train `q` principal components on the corpus (covariance pass +
    * driver Jacobi) and return them as rows; `project` applies them as a
    * broadcast q×d literal map — the same narrow shape as
    * [[Clustering]]'s assignment.
    */
  def train(corpus: DataFrame, vecCol: String, q: Int,
      roundDp: Int = 6): Array[Array[Double]] = {
    val m = collectMatrix(covarianceMatrix(corpus, vecCol, roundDp))
    jacobiEigen(m)._2.take(q)
  }

  /** Project the vector column onto the given components (rows of a q×d
    * matrix): a codegen'd fixed-order fold per component, zero shuffle.
    */
  def project(corpus: DataFrame, vecCol: String,
      components: Array[Array[Double]], roundDp: Int = 6): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val projections = components.toIndexedSeq.zipWithIndex.map { case (comp, idx) =>
      round(aggregate(
        zip_with(v, array(comp.toIndexedSeq.map(lit): _*), (x, w) => x * w),
        lit(0.0), (acc, z) => acc + z), roundDp).as(s"pc${idx + 1}")
    }
    corpus.select(col("*") +: projections: _*)
  }
}
