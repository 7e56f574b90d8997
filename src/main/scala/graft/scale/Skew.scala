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
}
