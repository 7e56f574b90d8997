package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NativeExpressions

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to hyperplane LSH (`Similarity.lshBucketTopK`):
  *
  *  1. train a small coarse quantizer (k centroids) with distributed
  *     Lloyd iterations — each round is one narrow assignment map (native
  *     [[graft.functions.NearestCentroids]] kernel) plus one map-side-
  *     combined aggregate of per-dimension sums; only k×(dim+1) numbers
  *     ever reach the driver;
  *  2. assign every corpus vector to its nearest centroid (its *cell*) —
  *     a narrow map, the inverted file is just a cell column;
  *  3. per query, probe the `nprobe` nearest cells and rank candidates by
  *     exact cosine — an equi-join on the cell id (shuffle carries ids +
  *     one int), so each query scans ≈ nprobe/k of the corpus instead of
  *     all of it.
  *
  * IVF vs LSH trade-off: IVF adapts to the data distribution (cells are
  * learned, so recall holds on clustered corpora where fixed random
  * hyperplanes waste bits), at the cost of a training pass; LSH is
  * training-free and fully deterministic from the vector alone. Both
  * recall paths are measured in ScaleSpec against brute force.
  */
object Ivf {

  /** Unit-normalize (zero vectors pass through): the quantizer works on
    * the unit sphere so L2 cell assignment is monotone in ANGLE — matching
    * the cosine ranking metric. Training/assigning on raw vectors loses
    * ~20 recall points on this corpus because L2 cells and cosine
    * neighborhoods disagree for unnormalized data (spherical k-means).
    */
  private def unit(v: Column): Column = {
    val n = Similarity.norm(v)
    when(n > 0, transform(v, x => x / n)).otherwise(v)
  }

  /** Deterministic Lloyd training on unit vectors. Init = k corpus vectors
    * chosen by xxhash64 order of the id (stable across runs/
    * partitionings). Empty cells keep their previous centroid. Returns
    * row-major (k × dim).
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iters: Int = 5): Array[Double] = {
    val v = corpus.select(col(idCol).as("id"),
      unit(Similarity.toDouble(col(vecCol))).as("v"))
    var cents: Array[Double] = v
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(k)
      .collect()
      .flatMap(_.getSeq[Double](1))
    require(cents.length == k * dim, s"need >= $k corpus vectors to train")
    var it = 0
    while (it < iters) {
      val assigned = v.withColumn("cell",
        element_at(NativeExpressions.nearest_centroids(col("v"), cents, k, dim, 1), 1))
      val sums = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(j => sum(element_at(col("v"), j + 1)).as(s"s$j")): _*)
        .collect()
      val next = cents.clone()
      sums.foreach { r =>
        val cell = r.getInt(0)
        val n = r.getLong(1).toDouble
        var j = 0
        while (j < dim) {
          next(cell * dim + j) = r.getDouble(2 + j) / n
          j += 1
        }
      }
      // Spherical k-means: re-normalize each centroid after the mean
      // update. Means of unit vectors have norms < 1 that differ per cell;
      // without this, argmin |v-c|² carries a per-cell |c|² bias and
      // assignment is no longer monotone in angle (diffuse cells steal
      // members from angularly-closer tight cells).
      var c2 = 0
      while (c2 < k) {
        var s = 0.0
        var j = 0
        while (j < dim) { val x = next(c2 * dim + j); s += x * x; j += 1 }
        val nrm = math.sqrt(s)
        if (nrm > 0) {
          j = 0
          while (j < dim) { next(c2 * dim + j) /= nrm; j += 1 }
        }
        c2 += 1
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Probed IVF search: top-k by exact cosine among the candidates in each
    * query's `nprobe` nearest cells. Output schema matches
    * `Similarity.bruteForceTopK` (query_id, rank, neighbor_id, sim).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, centroids: Array[Double],
      nCells: Int, nprobe: Int): DataFrame = {
    // unit-normalization FUSED into the kernel (normalize = true, bit-
    // identical to the unit() formulation): the cell expression lands in
    // join keys / filters where Catalyst duplicates it, and an interpreted
    // norm aggregate re-evaluated per duplicate dominated the corpus map
    val c = corpus.select(col(idCol).as("neighbor_id"),
      Similarity.toDouble(col(vecCol)).as("cv"))
      .withColumn("cell", element_at(
        NativeExpressions.nearest_centroids(col("cv"), centroids, nCells, dim,
          1, normalize = true), 1))
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.toDouble(col(vecCol)).as("qv"))
      .withColumn("cell", explode(
        NativeExpressions.nearest_centroids(col("qv"), centroids, nCells, dim,
          nprobe, normalize = true)))
    val scored = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Similarity.cosineNative(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
