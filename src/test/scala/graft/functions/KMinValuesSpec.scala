package graft.functions

import graft.SparkSpec
import graft.scale.Sampling
import org.apache.spark.sql.functions._

class KMinValuesSpec extends SparkSpec {

  test("below k distinct hashes the sketch is the exact count") {
    import spark.implicits._
    val df = (1L to 100L).flatMap(i => Seq(i, i)).toDF("v") // dups collapse
    val got = df.agg(NativeExpressions
      .kmv_distinct(Sampling.portableBucket(col("v")), k = 256).as("d"))
      .head().getDouble(0)
    assert(got == 100.0)
  }

  test("estimator matches the closed form on constructed hashes") {
    import spark.implicits._
    // hashes 1..500 in a domain of 1000: k-th min of k=100 is 100,
    // estimate = 99 * 1000 / 100 = 990
    val df = (1L to 500L).toDF("h")
    val got = df.agg(NativeExpressions
      .kmv_distinct(col("h"), k = 100, domain = 1000.0).as("d"))
      .head().getDouble(0)
    assert(got == 99.0 * 1000.0 / 100.0, s"got $got")
  }

  test("partitioning-invariant: merge across partitions changes nothing") {
    import spark.implicits._
    val df = (1L to 50000L).map(i => i % 4096).toDF("v")
      .select(Sampling.portableBucket(col("v")).as("h"))
    val one = df.coalesce(1)
      .agg(NativeExpressions.kmv_distinct(col("h"), 128).as("d")).head().getDouble(0)
    val many = df.repartition(16)
      .agg(NativeExpressions.kmv_distinct(col("h"), 128).as("d")).head().getDouble(0)
    assert(one == many, s"one-partition $one != 16-partition $many")
  }

  test("estimate lands within the KMV error envelope on real cardinalities") {
    import spark.implicits._
    val n = 20000L
    val df = (1L to n).toDF("v")
      .select(Sampling.portableBucket(col("v")).as("h"))
    val est = df.agg(NativeExpressions.kmv_distinct(col("h"), 256).as("d"))
      .head().getDouble(0)
    // ~1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.25, s"estimate $est for true $n")
  }

  test("callable from SQL; grouped aggregation works") {
    GraftExtensions.register(spark)
    import spark.implicits._
    (1L to 3000L).map(i => (s"g${i % 3}", i)).toDF("g", "v")
      .createOrReplaceTempView("kmv_in")
    val rows = spark.sql(
      """SELECT g, kmv_distinct((1103515245 * ((v % 2147483647) + 2147483647) % 2147483647
           + 12345) % 2147483647, 64) AS d
         FROM kmv_in GROUP BY g ORDER BY g""").collect()
    assert(rows.length == 3)
    // each group holds 1000 distinct values; k=64 estimate within 50%
    rows.foreach { r =>
      val d = r.getDouble(1)
      assert(d > 500 && d < 2000, s"group ${r.getString(0)}: $d")
    }
  }
}
