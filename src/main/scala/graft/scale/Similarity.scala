package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over embedding columns
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — queries are broadcast, the corpus
  * scan stays fully distributed, ranking is a per-query window. Cost is
  * O(|corpus| · |queries|) FLOPs with zero corpus shuffle, which is the
  * right baseline even at 100 TB when |queries| is small.
  *
  * Scale path: [[lshBucketTopK]] — random-hyperplane signatures bucket the
  * corpus so each query only scans its bucket (probing the query's own
  * signature); trades recall for a |corpus|/2^bits scan reduction.
  *
  * All math is double precision, summed in array order (left fold) — exact,
  * reproducible results independent of partitioning.
  */
object Similarity {

  /** Element-wise double cast — embeddings are float32 at rest; compute in
    * double for stable, engine-portable results.
    */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = {
    val na = norm(a); val nb = norm(b)
    when(na > 0 && nb > 0, dot(a, b) / (na * nb)).otherwise(lit(0.0))
  }

  /** Native fused kernel (graft.functions.CosineSimilarity) — bit-identical
    * to [[cosine]] (same accumulation order), one codegen'd loop instead of
    * three intermediate arrays per row.
    */
  def cosineNative(a: Column, b: Column): Column =
    graft.functions.NativeExpressions.cosine_similarity(a, b)

  /** Brute-force cosine top-k: for each row of `queries` (small; broadcast),
    * the k nearest rows of `corpus` by cosine, ties broken by corpus id.
    * Self-matches (same id) are excluded.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineNative(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Random-hyperplane LSH bucket signature: `bits` pseudo-random hyperplanes
    * derived deterministically from the dimension index (no RNG state —
    * reproducible across runs/engines). sign(dot(v, h_i)) packed to a long.
    */
  def hyperplaneSig(v: Column, dim: Int, bits: Int = 12): Column = {
    // h_i[j] in {-1, +1} from a fixed integer mix of (i, j)
    def sgn(i: Int, j: Int): Double =
      if ((((i * 2654435761L + j * 40503L) >>> 16) & 1L) == 1L) 1.0 else -1.0
    val bitCols = (0 until bits).map { i =>
      val proj = (0 until dim).map { j =>
        element_at(v, j + 1) * lit(sgn(i, j))
      }.reduce(_ + _)
      when(proj > 0, 1L << i).otherwise(0L)
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucketed ANN: corpus and queries hashed to hyperplane buckets; each
    * query joins only its bucket (equi-join shuffle on the bucket key), then
    * exact cosine + top-k within the candidates.
    */
  def lshBucketTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int,
      bits: Int = 12): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", hyperplaneSig(col("qv"), dim, bits))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", hyperplaneSig(col("cv"), dim, bits))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineNative(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
