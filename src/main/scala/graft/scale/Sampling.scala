package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, join-free sampling for training pipelines.
  *
  * `sample(fraction)` is the wrong tool for train/eval splits at scale:
  * it is seed- AND partitioning-dependent (a repartition changes the
  * sample), and two independent samples can overlap. Hashing the stable
  * document key instead gives splits that are reproducible across runs,
  * engines and partitionings, mutually disjoint, and cheap — one codegen'd
  * narrow map, no shuffle, no persisted split table to join against.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Stable bucket in [0, 1e6) from the key column (id or content hash). */
  def bucket(key: Column): Column = pmod(xxhash64(key), lit(Buckets))

  /** Rows whose key falls in [lo, hi) of the unit interval. Disjoint
    * ranges → disjoint samples; the same range always returns the same
    * rows regardless of partitioning.
    */
  def hashRange(df: DataFrame, key: Column, lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, "need 0 <= lo <= hi <= 1")
    val b = bucket(key)
    df.filter(b >= (lo * Buckets).toLong && b < (hi * Buckets).toLong)
  }

  /** Named splits from fractions (e.g. train 0.98 / val 0.01 / test 0.01):
    * contiguous, disjoint hash ranges covering [0, Σfractions). Returns
    * the input with a `split` column; fractions must sum to <= 1 (any
    * remainder is dropped — useful for subsampling a corpus).
    */
  def splitByHash(df: DataFrame, key: Column,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9,
      "fractions must sum to <= 1")
    val b = bucket(key)
    val bounds = fractions.scanLeft(0.0)(_ + _._2)
    val arms = fractions.zip(bounds.zip(bounds.tail)).map {
      case ((name, _), (lo, hi)) =>
        (b >= (lo * Buckets).toLong && b < (hi * Buckets).toLong, name)
    }
    val split = arms.tail.foldLeft(when(arms.head._1, arms.head._2)) {
      case (acc, (cond, name)) => acc.when(cond, name)
    }
    df.withColumn("split", split).filter(col("split").isNotNull)
  }
}
