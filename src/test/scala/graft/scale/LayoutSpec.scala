package graft.scale

import graft.SparkSpec
import graft.core.{Tables => T}
import org.apache.spark.sql.functions._

/** Data-layout contracts: bucketed tables join with zero exchange, and
  * range-sorted parquet proves its min/max pruning from the footers.
  */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("sorted layout: row-group ranges disjoint, narrow filter prunes most groups") {
    import spark.implicits._
    val dir = tmp("graft_sorted")
    val df = (0L until 100000L).toDF("k").withColumn("v", col("k") * 2)
    Layout.writeSorted(df, dir, col("k"), numFiles = 8)

    val ranges = Layout.columnRanges(spark, dir, "k")
    assert(ranges.size >= 8, s"expected >= 8 row groups, got $ranges")
    assert(ranges.map(_._3).sum == 100000L)
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, prevMax, _), (nextMin, _, _)) =>
        assert(nextMin >= prevMax,
          s"overlapping row groups: prevMax=$prevMax nextMin=$nextMin in $sorted")
      case _ =>
    }
    // a 1%-wide window can touch at most 2 of the >=8 groups
    val surviving = Layout.survivingRowGroups(spark, dir, "k", 40000, 41000)
    assert(surviving <= 2, s"sorted layout should prune to <=2 groups, got $surviving")
  }

  test("hash layout keeps every row group alive for the same filter") {
    import spark.implicits._
    val dir = tmp("graft_hashed")
    val df = (0L until 100000L).toDF("k").withColumn("v", col("k") * 2)
    df.repartition(8, col("k")).write.mode("overwrite").parquet(dir)
    val all = Layout.columnRanges(spark, dir, "k").size
    val surviving = Layout.survivingRowGroups(spark, dir, "k", 40000, 41000)
    assert(surviving == all,
      s"hash layout cannot prune: $surviving of $all groups survived")
  }

  test("bucketed co-located join: sort-merge with zero exchange, right answer") {
    import spark.implicits._
    val dir = tmp("graft_bkt")
    val cust = T.customer(spark, sf).select($"c_custkey", $"c_mktsegment")
    val ords = T.orders(spark, sf).select($"o_custkey", $"o_totalprice")
    Bucketing.writeBucketed(cust, "t_bkt_cust", s"$dir/cust", "c_custkey", 4)
    Bucketing.writeBucketed(ords, "t_bkt_ords", s"$dir/ords", "o_custkey", 4)

    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = Bucketing.colocatedJoin(spark,
        "t_bkt_cust", "t_bkt_ords", "c_custkey", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)

      val expected = cust.join(ords, $"c_custkey" === $"o_custkey").count()
      assert(joined.count() == expected)
      val got = joined.groupBy($"c_mktsegment").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = cust.join(ords, $"c_custkey" === $"o_custkey")
        .groupBy($"c_mktsegment").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    }
  }

  test("re-registered bucketed table keeps its bucket spec (DDL over existing files)") {
    import spark.implicits._
    val dir = tmp("graft_bkt2")
    val cust = T.customer(spark, sf).select($"c_custkey", $"c_mktsegment")
    Bucketing.writeBucketed(cust, "t_bkt_reg", s"$dir/cust", "c_custkey", 4)
    spark.sql("DROP TABLE t_bkt_reg")
    // a fresh catalog (new cluster, new session) re-registers the files
    Bucketing.createBucketedTable(spark, "t_bkt_reg", s"$dir/cust",
      cust.schema.toDDL, "c_custkey", 4)
    Bucketing.writeBucketed(T.orders(spark, sf)
        .select($"o_custkey", $"o_totalprice"),
      "t_bkt_ords2", s"$dir/ords", "o_custkey", 4)
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = Bucketing.colocatedJoin(spark,
        "t_bkt_reg", "t_bkt_ords2", "c_custkey", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"re-registered bucket spec lost — join shuffles:\n$plan")
      assert(joined.count() ==
        T.customer(spark, sf).join(T.orders(spark, sf),
          $"c_custkey" === $"o_custkey").count())
    }
  }
}
