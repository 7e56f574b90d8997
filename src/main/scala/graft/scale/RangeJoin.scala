package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketed) range join: pair points with the intervals containing
  * them WITHOUT a non-equi join.
  *
  * Spark plans a bare `p BETWEEN lo AND hi` join as BroadcastNestedLoopJoin
  * (or a cartesian when neither side broadcasts) — O(|points|·|intervals|)
  * comparisons, the canonical scale killer for event-in-validity-window /
  * reading-in-session / IP-in-CIDR-range joins. The binned plan turns it
  * into an EQUI join: pick a bin width, explode each interval to the bins
  * it covers, map each point to its single bin, hash-join on (equi keys,
  * bin), then apply the exact range predicate as a residual filter.
  *
  * No duplicates by construction: a (point, interval) pair meets in
  * exactly ONE join row — the point's bin (the interval emits that bin
  * iff it overlaps it), so no post-join dedup is needed.
  *
  * Scale shape: shuffle is |points| + Σ bins-per-interval rows on 16-byte
  * keys — both sides hash-partition on (keys, bin), so the join
  * parallelizes like any equi join and AQE handles hot bins. Bin width is
  * the one tuning knob: bins ≈ typical interval length makes the
  * per-interval explode O(1) while keeping per-bin candidate lists short.
  * A pathological interval spanning ≫ `maxBinsPerInterval` bins fails
  * fast with raise_error rather than silently exploding a task (set the
  * cap to accept it deliberately); the degenerate alternative — one giant
  * bin — is the nested-loop join again.
  *
  * Domain is integral (epoch micros/millis, integer keys): bin assignment
  * uses integer `div` (floor for the non-negative domains these joins use
  * in practice), so bin boundaries are exact — no double rounding at the
  * edges. Both bounds are INCLUSIVE (BETWEEN semantics).
  *
  * `points` and `intervals` must have disjoint column names; every input
  * column of both frames survives in the output.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, binWidth: Long,
      equiKeys: Seq[(String, String)] = Nil,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBinsPerInterval >= 1, "maxBinsPerInterval must be >= 1")
    val loBin = expr(s"$loCol div ${binWidth}L")
    val hiBin = expr(s"$hiCol div ${binWidth}L")
    val guarded = when(hiBin - loBin < lit(maxBinsPerInterval.toLong), hiBin)
      .otherwise(raise_error(concat(
        lit(s"rangeJoin: interval spans >= $maxBinsPerInterval bins of " +
          s"width $binWidth ("),
        (hiBin - loBin + 1).cast("string"),
        lit(") - raise maxBinsPerInterval or the bin width"))))
    val binned = intervals
      .withColumn("__bin", explode(sequence(loBin, guarded)))
    val pb = points.withColumn("__bin", expr(s"$pointCol div ${binWidth}L"))
    val joinCond = equiKeys
      .map { case (pk, ik) => pb(pk) === binned(ik) }
      .foldLeft(pb("__bin") === binned("__bin"))(_ && _)
    pb.join(binned, joinCond)
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(pb("__bin")).drop(binned("__bin"))
  }
}
