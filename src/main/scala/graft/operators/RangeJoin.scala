package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each left POINT to every right INTERVAL
  * containing it — sessions-to-events, promotions-to-orders, IP-to-range,
  * variant-to-gene. The declarative form (`p BETWEEN lo AND hi` with no
  * equi key) gives Spark nothing to hash on, so Catalyst falls back to
  * BroadcastNestedLoopJoin — O(|L|·|R|) compares and a broadcast
  * requirement that dies at scale (RangeJoinSpec shows the fallback).
  *
  * This operator manufactures the equi key by BINNING the domain: a point
  * joins its single bin `floor(p / w)`; an interval explodes into the
  * bins it covers (`floor(lo/w) .. floor(hi/w)`). The bin-equi join then
  * runs as a plain shuffled hash/sort-merge join, and the exact
  * `BETWEEN` predicate filters within bins. A point lives in EXACTLY one
  * bin, so each (point, interval) match is produced once — no dedup pass.
  *
  * Cost: |L| + |R|·(len/w + 1) join-input rows and bucket-local compare
  * work — linear, shuffled, AQE-skew-splittable. Pick `w` near the median
  * interval length: larger w → fewer interval replicas but more
  * in-bucket compares; smaller w → the reverse. An optional equi `key`
  * (e.g. user_id) composes with the bin to tighten buckets further.
  */
object RangeJoin {

  /** @param points    left side; `pointCol` must be a numeric (e.g.
    *                  unix_micros) column
    * @param intervals right side with numeric `loCol`/`hiCol` (inclusive
    *                  bounds, lo <= hi)
    * @param binWidth  bin width in the point/bound units (> 0)
    * @param key       optional extra equi-key column name present on both
    *                  sides
    * @return every (point row ++ interval row) pair with
    *         lo <= point <= hi; interval columns that collide with point
    *         column names are suffixed `_r`; the bin (and right key) are
    *         internal and dropped
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long, key: Option[String] = None): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    // disambiguate overlapping column names on the interval side
    val overlap = intervals.columns.toSet
      .intersect(points.columns.toSet) -- key
    val r0 = overlap.foldLeft(intervals) { (acc, c) =>
      acc.withColumnRenamed(c, s"${c}_r")
    }
    val lo = if (overlap(loCol)) s"${loCol}_r" else loCol
    val hi = if (overlap(hiCol)) s"${hiCol}_r" else hiCol

    val l = points.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    val r = r0.withColumn("__bin",
      explode(sequence(floorDiv(col(lo), binWidth), floorDiv(col(hi), binWidth))))
    val cond = {
      val range = col(pointCol) >= col(lo) && col(pointCol) <= col(hi)
      key match {
        case Some(k) => l("__bin") === r("__bin") && l(k) === r(k) && range
        case None => l("__bin") === r("__bin") && range
      }
    }
    val joined = l.join(r, cond).drop(l("__bin")).drop(r("__bin"))
    key.map(k => joined.drop(r(k))).getOrElse(joined)
  }

  /** Exact floor division for integral columns (`div` truncates toward
    * zero, wrong for negatives; double division can misbin at the edges):
    * subtract the non-negative `pmod` remainder, then the division is an
    * exact multiple.
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c.cast("long") - pmod(c.cast("long"), lit(w))) / w).cast("long")
}
