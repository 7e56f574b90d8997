package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), Some(2.5)),
    (2L, Some("b"), Some(1.0)),
    (3L, None: Option[String], Some(2.5)),
    (4L, Some("a"), None: Option[Double]),
    (5L, Some("c"), Some(9.75))
  ).toDF("id", "s", "x")

  test("exact profile: counts, distincts, min/max per column") {
    val p = Profiling.profile(fixture, Seq("id", "s", "x"), exact = true)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((5L, 5L, 5L, "1", "5")))
    assert(p("s") == ((5L, 4L, 3L, "a", "c")))
    assert(p("x") == ((5L, 4L, 3L, "1.0", "9.75")))
    // ordered by column name
    val names = Profiling.profile(fixture, Seq("x", "id", "s"), exact = true)
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("id", "s", "x"))
  }

  test("approx profile matches exact everywhere but n_distinct, which is close") {
    val ex = Profiling.profile(fixture, Seq("id", "s", "x"), exact = true).collect()
    val ap = Profiling.profile(fixture, Seq("id", "s", "x")).collect()
    ex.zip(ap).foreach { case (e, a) =>
      assert(e.getString(0) == a.getString(0))
      assert(e.getLong(1) == a.getLong(1) && e.getLong(2) == a.getLong(2))
      assert(e.getString(4) == a.getString(4) && e.getString(5) == a.getString(5))
      // HLL++ at default rsd on single-digit cardinalities is exact in
      // practice; allow a whisker anyway
      assert(math.abs(e.getLong(3) - a.getLong(3)) <= 1)
    }
  }

  test("neither mode plans an Expand node") {
    val approxPlan = Profiling.profile(fixture, Seq("id", "s", "x"))
      .queryExecution.executedPlan.toString
    val exactPlan = Profiling.profile(fixture, Seq("id", "s", "x"), exact = true)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"))
    assert(!exactPlan.contains("Expand"),
      "exact mode must use per-column union branches, not multi-distinct Expand")
  }

  test("exact branches prune the parquet scan to their own column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prof").toString
    fixture.write.mode("overwrite").parquet(dir)
    val plan = Profiling.profile(spark.read.parquet(dir), Seq("id", "s"),
      exact = true).queryExecution.executedPlan.toString
    // one scan per branch, each reading a single column
    assert(plan.contains("ReadSchema: struct<id:bigint>"))
    assert(plan.contains("ReadSchema: struct<s:string>"))
    assert(!plan.contains("ReadSchema: struct<id:bigint,s:string"))
  }

  test("all-null column profiles to null min/max and zero distinct") {
    val df = Seq((1L, None: Option[String]), (2L, None)).toDF("id", "s")
    val r = Profiling.profile(df, Seq("s"), exact = true).collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }
}
