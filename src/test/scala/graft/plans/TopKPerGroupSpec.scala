package graft.plans

import graft.SparkSpec
import graft.core.{Tables => T}
import org.apache.spark.sql.functions._

/** The custom whole-operator top-k path: answer parity with the window
  * rank form, plan shape (partial below the exchange, final above), and
  * the partial's row-bound that IS the operator's reason to exist.
  */
class TopKPerGroupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("matches the window-rank answer on events, including k > group size") {
    import spark.implicits._
    val ev = T.events(spark, sf).select($"event_type", $"event_id", $"value")
    for (k <- Seq(3, 100000)) {
      val custom = TopKPerGroup(ev, Seq("event_type"),
        Seq($"value".desc, $"event_id".asc), k)
        .select($"event_type", $"event_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"value".desc, $"event_id".asc)
      val win = ev.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
        .select($"event_type", $"event_id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(custom == win, s"k=$k")
    }
  }

  // AQE wraps the physical tree in AdaptiveSparkPlanExec whose custom
  // nodes only appear in inputPlan (children is Nil on the wrapper)
  private def physical(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }

  test("plan: partial heap below ONE exchange, final above, no sort") {
    import spark.implicits._
    // multi-partition input: a single-partition child satisfies
    // ClusteredDistribution trivially and no exchange appears at all
    val df = spark.range(0, 1000, 1, 4)
      .select(($"id" % 5).cast("string").as("grp"), $"id",
        ($"id" % 997).cast("double").as("v"))
    // AQE's inputPlan is pre-EnsureRequirements (no exchanges yet) and
    // its final plan hides them in query stages — assert the static shape
    val top = TopKPerGroup(df, Seq("grp"), Seq($"v".desc, $"id".asc), 5)
    val plan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      TopKPerGroup(df, Seq("grp"), Seq($"v".desc, $"id".asc), 5)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // top-down print (physical nodes strip the Exec suffix): final
    // first, then the exchange, then the partial — reduce-before-the-wire
    val hits = "TopKPerGroup ".r.findAllMatchIn(plan).map(_.start).toSeq
    assert(hits.size == 2, plan)
    val exchangeIdx = plan.indexOf("Exchange hashpartitioning(grp")
    assert(exchangeIdx >= 0, plan)
    assert(hits.head < exchangeIdx && exchangeIdx < hits(1), plan)
    // the whole point: no full sort of the input anywhere in the plan
    assert(!plan.contains("Sort ["), plan)
    assert(top.count() == 25)
  }

  test("adaptive partial: pass-through at high cardinality, same answer") {
    import spark.implicits._
    // 200k rows x ~100k groups in ONE partition: the probe (64k rows)
    // sees retention > 1/2 and flips the partial to pass-through, so its
    // output is heaped-prefix + raw-suffix — still a superset of top-k
    // per group, and the final must land the exact window-form answer.
    val n = 200000L
    val df = spark.range(0, n, 1, 1)
      .select(pmod(hash($"id"), lit(100000)).cast("long").as("grp"),
        $"id", ($"id" % 997).cast("double").as("v"))
    val top = TopKPerGroup(df, Seq("grp"), Seq($"v".desc, $"id".asc), 2)
    val partialRows = physical(top).collect {
      case e: TopKPerGroupExec if e.partial => e
    }.head.execute().count()
    // pass-through emits ~everything (bounded heaps only over the probe
    // prefix); a non-skipping partial would have reduced toward k×groups
    assert(partialRows > n / 2, s"partial emitted only $partialRows rows")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"v".desc, $"id".asc)
    val win = df.withColumn("rk", row_number().over(w)).filter($"rk" <= 2)
      .select($"grp", $"id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = top.select($"grp", $"id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == win)
  }

  test("partial bounds shuffled rows to k per group per partition") {
    import spark.implicits._
    // 4 partitions x 1 group x 10k rows: the exchange input is the
    // partial's output — at most k rows per (partition, group), so the
    // final sees <= 4k rows, not 40k. Assert through the partial's own
    // output row count.
    val df = spark.range(0, 40000, 1, 4)
      .select(lit("g").as("grp"), $"id", ($"id" % 997).cast("double").as("v"))
    val top = TopKPerGroup(df, Seq("grp"), Seq($"v".desc, $"id".asc), 7)
    val partialRows = physical(top).collect {
      case e: TopKPerGroupExec if e.partial => e
    }.head.execute().count()
    assert(partialRows <= 4 * 7, s"partial emitted $partialRows rows")
    assert(top.count() == 7)
    // deterministic under a different input partitioning (total order)
    val again = TopKPerGroup(df.repartition(13, $"id"), Seq("grp"),
      Seq($"v".desc, $"id".asc), 7)
    assert(again.select("id").collect().map(_.getLong(0)).toSet ==
      top.select("id").collect().map(_.getLong(0)).toSet)
  }
}
