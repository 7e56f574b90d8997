package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT order statistics without order-statistic state: SQL-standard
  * PERCENTILE_DISC (the dataset element at rank ⌈p·n⌉, min rank 1) via
  * iterative histogram refinement.
  *
  * Why not `percentile()` (q31's path)? Spark's exact percentile is a
  * buffering aggregate — it materializes every value of the group in the
  * aggregation state. Fine per small group; a 100 TB GLOBAL quantile (or
  * one giant group) OOMs the state. This operator keeps state bounded at
  * `buckets` counters per partition regardless of data size:
  *
  *   1. one scan: (n, min, max);
  *   2. per refinement level, ONE scan serves ALL requested ps: each value
  *      emits a (p_idx, bucket) hit for every p whose candidate set still
  *      contains it — partial aggregation collapses hits to ≤ parts ×
  *      |ps| × buckets counter rows before the shuffle (the histogram IS
  *      the combiner state; values never shuffle);
  *   3. walking a level's cumulative histogram narrows each p to one
  *      bucket and a within-bucket rank; once a p's candidate count ≤
  *      `maxCollect`, the exact element is selected from the (tiny)
  *      filtered slice. Candidates shrink ×buckets per level — two levels
  *      resolve 10^13 rows at the default 4096.
  *
  * Correctness details:
  *   - membership in a candidate set is defined by the CHAIN of bucket
  *     expressions chosen so far (`floor((v-lo)/w) = bk` at each level,
  *     re-evaluated identically in later scans) — never by numeric range
  *     comparison against recomputed boundaries, so a value sitting within
  *     1 ulp of a bucket edge can't be counted by one pass and filtered
  *     out by the next;
  *   - the answer is an exact ELEMENT at an exact integer rank — no
  *     arithmetic reaches the output, so engine fp conventions are
  *     irrelevant (boundaries only steer the search);
  *   - a bucket whose values are all identical (lo == hi after refinement)
  *     short-circuits to that value.
  */
object Quantiles {

  /** One refinement step already chosen: bucket `bk` of the histogram over
    * [`lo`, `lo` + buckets·`w`). Membership = floor((v − lo)/w) clamped
    * to the last bucket equals bk.
    */
  private final case class Step(lo: Double, w: Double, bk: Int, buckets: Int)

  private def stepExpr(s: Step): Column =
    least(lit(s.buckets - 1),
      floor((col("v") - lit(s.lo)) / lit(s.w)).cast("int")) === lit(s.bk)

  private def memberExpr(chain: List[Step]): Column =
    chain.foldLeft(lit(true))((acc, s) => acc && stepExpr(s))

  private final case class Cand(p: Double, lo: Double, hi: Double,
      rank: Long, cnt: Long, chain: List[Step], done: Option[Double])

  def exactQuantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
      buckets: Int = 4096, maxCollect: Int = 100000,
      maxLevels: Int = 8): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    // Freeze the value projection (guide §2.4 "share one exchange"): the
    // stats pass, every refinement level and the final selection are
    // SEPARATE driver-sequenced jobs over this frame, and without the
    // freeze each job re-ran the scan+cast from the source — single-task
    // when the input is one unsplittable file (the r15 Par-floor probe
    // regressed exactly because its exchange re-ran per level job).
    // Freezing AFTER the conditional round-robin spread means the
    // exchange runs once (level jobs see a skipped map stage and read the
    // same shuffle files at full parallelism); on a many-split scan
    // Par.ensure is a no-op and the freeze just snaps the pruned scan.
    val vals = org.apache.spark.sql.graftbridge.Bridge.freezeLineage(
      graft.core.Par.ensure(
        df.select(col(valueCol).cast("double").as("v"))
          .where(col("v").isNotNull)))
    val statsRow = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    val n = statsRow.getLong(0)
    require(n > 0, "exactQuantiles over an empty input")
    val (gMin, gMax) = (statsRow.getDouble(1), statsRow.getDouble(2))

    var cands: Seq[Cand] = ps.map { p =>
      val k = math.max(1L, math.ceil(p * n).toLong)
      Cand(p, gMin, gMax, k, n, Nil, if (gMin == gMax) Some(gMin) else None)
    }

    var level = 0
    while (cands.exists(c => c.done.isEmpty && c.cnt > maxCollect) &&
        level < maxLevels) {
      val open = cands.zipWithIndex
        .filter { case (c, _) => c.done.isEmpty && c.cnt > maxCollect }
      val hitExprs = open.zipWithIndex.map { case ((c, _), pi) =>
        val w = (c.hi - c.lo) / buckets
        val b = least(lit(buckets - 1),
          floor((col("v") - lit(c.lo)) / lit(w)).cast("int"))
        when(memberExpr(c.chain), struct(lit(pi).as("pi"), b.as("bk")))
          .otherwise(lit(null))
      }
      val hists = vals
        .select(explode(filter(array(hitExprs: _*), h => h.isNotNull)).as("h"))
        .groupBy(col("h.pi"), col("h.bk"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (pi, rows) =>
          pi -> rows.map(r => r.getInt(1) -> r.getLong(2)).sortBy(_._1)
        }
      val refined = open.zipWithIndex.map { case ((c, idx), pi) =>
        val w = (c.hi - c.lo) / buckets
        val h = hists.getOrElse(pi, Array.empty[(Int, Long)])
        var cum = 0L
        var out: Cand = null
        var bi = 0
        while (bi < h.length && out == null) {
          val (bk, cnt) = h(bi)
          if (cum + cnt >= c.rank) {
            val lo2 = c.lo + bk * w
            val hi2 = if (bk == buckets - 1) c.hi else c.lo + (bk + 1) * w
            val chain2 = Step(c.lo, w, bk, buckets) :: c.chain
            out =
              if (lo2 == hi2)
                // bucket degenerated to one representable value: every
                // member is that value, so ANY rank selects it — rank 1
                // routes through the cheap exact-selection path (limit(1))
                // rather than trusting the rounded boundary to be the
                // element
                c.copy(lo = lo2, hi = hi2, rank = 1L, cnt = 1L, chain = chain2)
              else c.copy(lo = lo2, hi = hi2, rank = c.rank - cum, cnt = cnt,
                chain = chain2)
          }
          cum += cnt
          bi += 1
        }
        require(out != null, s"rank ${c.rank} beyond histogram for p=${c.p}")
        idx -> out
      }.toMap
      cands = cands.zipWithIndex.map { case (c, i) => refined.getOrElse(i, c) }
      level += 1
    }

    // exact selection for every still-open p in ONE job over ONE scan:
    // each value emits a (p, v, target-rank) hit per open candidate slice
    // containing it (same fused-hit shape as the histogram levels), a
    // per-p window ranks each ≤ maxCollect slice ascending, and row rank
    // == target rank is the element. Separate per-p jobs would pay one
    // full scan plus one scheduling round trip per quantile.
    val open = cands.filter(_.done.isEmpty)
    val selected: Map[Double, Double] =
      if (open.isEmpty) Map.empty
      else {
        val hit = open.map { c =>
          when(memberExpr(c.chain),
            struct(lit(c.p).as("p"), col("v").as("v"),
              lit(c.rank).as("target"))).otherwise(lit(null))
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("p")).orderBy(col("v"))
        vals.select(explode(filter(array(hit: _*), h => h.isNotNull)).as("h"))
          .select(col("h.p").as("p"), col("h.v").as("v"),
            col("h.target").as("target"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") === col("target"))
          .select(col("p"), col("v"))
          .collect()
          .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      }
    val results = cands.map { c =>
      c.done match {
        case Some(v) => (c.p, v)
        case None => (c.p, selected(c.p))
      }
    }
    import spark.implicits._
    results.toDF("p", "value")
  }

  /** Per-GROUP exact PERCENTILE_DISC with the same bounded-state
    * histogram refinement: every level is still ONE scan for ALL
    * (group, p) candidates — each value emits a hit per open candidate
    * whose group matches and whose bucket chain contains it — so the
    * scan count does not grow with the number of groups. Executor state
    * stays ≤ parts × #open × buckets counters; driver state is one
    * (range, rank) per (group, p) — the documented bound (thousands of
    * groups are fine; for millions, fall back to `percentile()` per
    * small group, which is exactly the regime where its buffering is
    * safe). Group rendered as string in the output.
    */
  def exactQuantilesByGroup(df: DataFrame, valueCol: String,
      groupCol: String, ps: Seq[Double], buckets: Int = 4096,
      maxCollect: Int = 100000, maxLevels: Int = 8): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    // same per-level scan-reuse freeze as [[exactQuantiles]]
    val vals = org.apache.spark.sql.graftbridge.Bridge.freezeLineage(
      graft.core.Par.ensure(df
        .select(col(groupCol).cast("string").as("g"),
          col(valueCol).cast("double").as("v"))
        .where(col("v").isNotNull && col("g").isNotNull)))
    final case class GCand(g: String, p: Double, lo: Double, hi: Double,
        rank: Long, cnt: Long, chain: List[Step], done: Option[Double])
    val stats = vals.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect()
    var cands: Seq[GCand] = stats.toSeq.flatMap { r =>
      val (g, n, mn, mx) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      ps.map { p =>
        val k = math.max(1L, math.ceil(p * n).toLong)
        GCand(g, p, mn, mx, k, n, Nil, if (mn == mx) Some(mn) else None)
      }
    }
    var level = 0
    while (cands.exists(c => c.done.isEmpty && c.cnt > maxCollect) &&
        level < maxLevels) {
      val open = cands.zipWithIndex
        .filter { case (c, _) => c.done.isEmpty && c.cnt > maxCollect }
      val hitExprs = open.zipWithIndex.map { case ((c, _), pi) =>
        val w = (c.hi - c.lo) / buckets
        val b = least(lit(buckets - 1),
          floor((col("v") - lit(c.lo)) / lit(w)).cast("int"))
        when(col("g") === lit(c.g) && memberExpr(c.chain),
          struct(lit(pi).as("pi"), b.as("bk"))).otherwise(lit(null))
      }
      val hists = vals
        .select(explode(filter(array(hitExprs: _*), h => h.isNotNull)).as("h"))
        .groupBy(col("h.pi"), col("h.bk"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (pi, rows) =>
          pi -> rows.map(r => r.getInt(1) -> r.getLong(2)).sortBy(_._1)
        }
      val refined = open.zipWithIndex.map { case ((c, idx), pi) =>
        val w = (c.hi - c.lo) / buckets
        val h = hists.getOrElse(pi, Array.empty[(Int, Long)])
        var cum = 0L
        var out: GCand = null
        var bi = 0
        while (bi < h.length && out == null) {
          val (bk, cnt) = h(bi)
          if (cum + cnt >= c.rank) {
            val lo2 = c.lo + bk * w
            val hi2 = if (bk == buckets - 1) c.hi else c.lo + (bk + 1) * w
            val chain2 = Step(c.lo, w, bk, buckets) :: c.chain
            out =
              if (lo2 == hi2)
                c.copy(lo = lo2, hi = hi2, rank = 1L, cnt = 1L, chain = chain2)
              else c.copy(lo = lo2, hi = hi2, rank = c.rank - cum, cnt = cnt,
                chain = chain2)
          }
          cum += cnt
          bi += 1
        }
        require(out != null, s"rank ${c.rank} beyond histogram for (${c.g}, ${c.p})")
        idx -> out
      }.toMap
      cands = cands.zipWithIndex.map { case (c, i) => refined.getOrElse(i, c) }
      level += 1
    }
    val open = cands.filter(_.done.isEmpty)
    val selected: Map[(String, Double), Double] =
      if (open.isEmpty) Map.empty
      else {
        val hit = open.map { c =>
          when(col("g") === lit(c.g) && memberExpr(c.chain),
            struct(lit(c.g).as("cg"), lit(c.p).as("p"), col("v").as("v"),
              lit(c.rank).as("target"))).otherwise(lit(null))
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("cg"), col("p")).orderBy(col("v"))
        vals.select(explode(filter(array(hit: _*), h => h.isNotNull)).as("h"))
          .select(col("h.cg").as("cg"), col("h.p").as("p"),
            col("h.v").as("v"), col("h.target").as("target"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") === col("target"))
          .select(col("cg"), col("p"), col("v"))
          .collect()
          .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      }
    val results = cands.map { c =>
      c.done match {
        case Some(v) => (c.g, c.p, v)
        case None => (c.g, c.p, selected((c.g, c.p)))
      }
    }
    import spark.implicits._
    results.toDF("group", "p", "value")
  }
}
