package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model/ranking evaluation metrics over pre-quantized scores — the
  * "did the classifier / retriever / filter actually work" leg every
  * training-data pipeline runs after curation (beyond the reference —
  * its ML leg stops at scoring, `test.py:477`; a corpus pipeline also
  * has to grade the scorers it gates documents with).
  *
  * Design rules shared by the family:
  *   - scores arrive as INTEGER units (the caller picks the resolution,
  *     e.g. permille) — the metric state then collapses from O(rows) to
  *     O(distinct units) per group BEFORE any ordered pass, so the
  *     windows below run over ≤ resolution-sized frames no matter how
  *     many billions of rows were scored;
  *   - every metric is an exact integer statistic divided once at the
  *     end (AUC, KS, kappa) or a fixed-order IEEE fold (NDCG) — the
  *     oracle replays the same integers and the same fold order, so a
  *     hash-match certifies the arithmetic, not a tolerance;
  *   - nothing collects to the driver; outputs are one row per group /
  *     query / class.
  */
object Eval {

  /** Exact tie-aware ROC-AUC per group.
    *
    * AUC = P(score⁺ > score⁻) + ½P(score⁺ = score⁻) over all
    * positive/negative pairs — the Mann-Whitney U statistic. Computed
    * on the (group, units) contingency collapse:
    *
    *   numer2 = Σ_v pos_v · (2·negBelow_v + neg_v),  AUC = numer2 / (2·P·N)
    *
    * all in int64 (numer2 ≤ 2PN ≤ 2·(rows/2)² — overflow needs ~3·10⁹
    * rows in ONE group at which point the caller shards the group), one
    * double division at the end. The prefix sum runs per group over the
    * distinct-unit frame (≤ score resolution rows), never over raw rows
    * — the 100 TB shape: a billion scored docs collapse to ≤1001 rows
    * per group before the window.
    *
    * Degenerate groups (no positives or no negatives) report a null AUC
    * rather than a divide-by-zero.
    */
  def binaryAuc(df: DataFrame, groupCol: Column, unitsCol: Column,
      labelCol: Column): DataFrame = {
    val per = df
      .select(groupCol.as("g"), unitsCol.cast("long").as("u"),
        labelCol.cast("long").as("y"))
      .groupBy(col("g"), col("u"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      .withColumn("neg", col("n") - col("pos"))
    val below = Window.partitionBy(col("g")).orderBy(col("u"))
      .rowsBetween(Window.unboundedPreceding, -1)
    per
      .withColumn("negBelow", coalesce(sum(col("neg")).over(below), lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("pos") * (lit(2L) * col("negBelow") + col("neg")))
          .as("numer2"))
      .select(col("g").as("group"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0L && col("n_neg") > 0L,
          round(col("numer2").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") *
              col("n_neg").cast("double")), 6)).as("auc"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group.
    *
    * D = max_v |F_a(v) − F_b(v)| over the pooled distinct values;
    * computed as the integer numerator max_v |n_b·C_a(v) − n_a·C_b(v)|
    * (C = inclusive cumulative count) so the max is taken over exact
    * int64 — no double comparisons steer the answer; the single division
    * happens after the max. Same collapsed-units scaling story as
    * [[binaryAuc]]: the ordered pass sees distinct units, not rows.
    *
    * `sideCol` must be a boolean column — true rows form sample A,
    * false rows sample B. Groups missing a side report null D.
    */
  def ksStatistic(df: DataFrame, groupCol: Column, unitsCol: Column,
      sideCol: Column): DataFrame = {
    val per = df
      .select(groupCol.as("g"), unitsCol.cast("long").as("u"),
        sideCol.cast("long").as("a"))
      .groupBy(col("g"), col("u"))
      .agg(sum(col("a")).as("na_v"),
        (count(lit(1)) - sum(col("a"))).as("nb_v"))
    val upTo = Window.partitionBy(col("g")).orderBy(col("u"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("ca", sum(col("na_v")).over(upTo))
      .withColumn("cb", sum(col("nb_v")).over(upTo))
      .withColumn("ta", sum(col("na_v")).over(whole))
      .withColumn("tb", sum(col("nb_v")).over(whole))
      .groupBy(col("g"))
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        max(abs(col("tb") * col("ca") - col("ta") * col("cb")))
          .as("d_num"))
      .select(col("g").as("group"), col("n_a"), col("n_b"), col("d_num"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          round(col("d_num").cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 6)).as("d"))
  }
}
