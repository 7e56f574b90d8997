package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at 100 TB (AQE's skew-join
  * split handles joins; these cover the aggregate and explicit-salt cases).
  */
object Skew {

  /** Two-stage salted aggregation: groupBy (key, salt) for the partial
    * aggregate, then re-aggregate by key. Correct for any commutative
    * re-aggregatable function pair (sum/sum, count/sum, min/min, max/max).
    * Spark's map-side partial aggregation usually makes this unnecessary —
    * use it when a single reducer key still overflows (e.g. extreme
    * hot-key count-distinct pre-dedup).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__n")).as("n"))
  }

  /** Salted distinct count for a hot key: stage 1 dedups (key, value)
    * within salt buckets, stage 2 dedups across buckets and counts.
    */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
      saltBuckets: Int = 32): DataFrame =
    df.select(col(key), col(valueCol))
      .withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(saltBuckets)))
      .groupBy(col(key), col("__salt"), col(valueCol)).agg(lit(1).as("__one"))
      .groupBy(col(key))
      .agg(count(lit(1)).as(s"n_distinct_$valueCol"))

  /** Explicit salted equi-join for a hot-key fact⋈dim: the fact side gets
    * a per-row salt in [0, saltBuckets), the dim side replicates each row
    * once per salt value, and the join runs on (key, salt) — a fact key
    * holding 10% of the corpus spreads over `saltBuckets` reducers
    * instead of melting one. Result rows are EXACTLY the plain join's
    * (the salt only routes; q162 hash-certifies equality against the
    * unsalted SQL join).
    *
    * When to reach for it over AQE's skew-join split: the dim side is
    * too big to broadcast but small enough to replicate ×buckets
    * (replication cost = |dim|·buckets rows through one exchange), and
    * the skew is known AT PLAN TIME — e.g. a fixed hot-partner join that
    * AQE would re-split every run anyway, or an engine running with AQE
    * off. For one-off unknown skew, prefer AQE (zero replication).
    * The salt uses xxhash64 over (key, monotonic row id) — routing needs
    * spread, not cross-engine portability; results are salt-invariant.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be >= 1: $saltBuckets")
    val sf = fact.withColumn("__fsalt",
      pmod(xxhash64(col(factKey), monotonically_increasing_id()),
        lit(saltBuckets.toLong)).cast("int"))
    val sd = dim.withColumn("__dsalt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    sf.join(sd,
        sf(factKey) === sd(dimKey) && sf("__fsalt") === sd("__dsalt"))
      .drop("__fsalt", "__dsalt")
  }
}
