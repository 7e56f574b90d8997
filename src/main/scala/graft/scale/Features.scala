package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric feature conditioning for training pipelines: outlier clipping
  * (winsorization) and int8 embedding quantization.
  *
  * Both are the "last mile" before tensors: clip the heavy tails so a few
  * corrupt readings don't dominate a standardized feature, and shrink
  * float32 embedding stores 4× for ANN serving. The reference's feature
  * pipeline does the sibling steps (median impute + standard scale,
  * `test.py` / `imputer.joblib`, `scaler.joblib`) — these are the two it
  * would need next at corpus scale.
  */
object Features {

  /** Winsorize `valueCol` within each stratum at the exact [pLo, pHi]
    * percentiles and report per-stratum clipping stats.
    *
    * Exact `percentile` buffers each stratum's values in aggregation state
    * — the right trade for a bounded stratum count (event types, sources,
    * languages). For a 100 TB GLOBAL clip or million-stratum keys, swap
    * the percentile pass for [[Quantiles.exactQuantiles]] /
    * [[Quantiles.exactQuantilesByGroup]] (bounded state, same exactness) —
    * the clip/aggregate pass below is unchanged.
    *
    * Determinism: bounds are 4dp-rounded (like q31), the clip compares
    * raw doubles against those bounds (same IEEE compares both engines),
    * and the clipped sum goes through DECIMAL(18,4).
    *
    * Plan: percentile aggregate (one keyed shuffle over narrow rows) →
    * broadcast the #strata-row bounds back → one more map-side-combined
    * aggregate. The fact table never shuffles: only (stratum, value)
    * projections move.
    */
  def winsorizeStats(df: DataFrame, strataCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    val bounds = df.groupBy(col(strataCol))
      .agg(round(expr(s"percentile($valueCol, $pLo)"), 4).as("lo"),
        round(expr(s"percentile($valueCol, $pHi)"), 4).as("hi"))
    val clipped = df.select(col(strataCol), col(valueCol))
      .join(broadcast(bounds), Seq(strataCol))
      .withColumn("__clip",
        least(greatest(col(valueCol), col("lo")), col("hi")))
    clipped.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(valueCol) < col("lo"), 1L).otherwise(0L))
          .as("n_clipped_lo"),
        sum(when(col(valueCol) > col("hi"), 1L).otherwise(0L))
          .as("n_clipped_hi"),
        first(col("lo")).as("lo"),
        first(col("hi")).as("hi"),
        sum(col("__clip").cast("decimal(18,4)")).cast("double")
          .as("clipped_sum"))
  }

  /** Quantile bucketizer: assign each value its stratum-local quantile
    * bucket (0..nBuckets−1) from exact interior cut points — the
    * distribution-aware discretization (Spark MLlib's QuantileDiscretizer
    * shape, but exact and cross-engine deterministic instead of
    * approxQuantile-based), returned as per-(stratum, bucket) occupancy
    * stats.
    *
    * Bucket rule: bucket(v) = #{cut points c : v > c}, cuts at
    * p = 1/n .. (n−1)/n rounded to 4dp — pinned comparisons against
    * identical rounded doubles on both engines. Equal values always land
    * in the same bucket (cut membership is a pure function of the value),
    * so bucket populations are only ~equal-sized when values are mostly
    * distinct — the correct semantics for a feature discretizer (ntile's
    * rank-based split would separate ties).
    *
    * Same plan shape as [[winsorizeStats]]: one percentile aggregate over
    * narrow rows, bounds broadcast back, one map-side-combined aggregate;
    * the same [[Quantiles]] escape hatch applies for huge stratum counts.
    */
  def bucketizeByQuantiles(df: DataFrame, strataCol: String,
      valueCol: String, nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, "bucketize needs >= 2 buckets")
    val ps = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val bounds = df.groupBy(col(strataCol))
      .agg(transform(
        expr(s"percentile($valueCol, array(${ps.mkString(",")}))"),
        b => round(b, 4)).as("__cuts"))
    df.select(col(strataCol), col(valueCol))
      .join(broadcast(bounds), Seq(strataCol))
      .withColumn("bucket",
        aggregate(col("__cuts"), lit(0L),
          (acc, c) => acc + when(col(valueCol) > c, 1L).otherwise(0L)))
      .groupBy(col(strataCol), col("bucket"))
      .agg(count(lit(1)).as("n"),
        round(min(col(valueCol)), 6).as("v_min"),
        round(max(col(valueCol)), 6).as("v_max"))
  }

  /** Robust outlier statistics per stratum: median, MAD (median absolute
    * deviation), and the count of rows beyond `k` robust sigmas
    * (σ ≈ 1.4826·MAD under normality) — the outlier detector that a few
    * corrupt readings CANNOT drag, unlike mean/stddev z-scores where the
    * outliers inflate their own yardstick.
    *
    * Two percentile passes (the median of deviations needs the median
    * first), each the [[winsorizeStats]] shape: bounded-strata exact
    * percentile → broadcast join back → map-side-combined aggregate. The
    * same [[Quantiles]] bounded-state swap applies for huge strata.
    * Medians/MADs round to 4dp (q31 convention); the cutoff compare uses
    * one multiply chain of explicit double literals, identical on both
    * engines.
    */
  def madOutlierStats(df: DataFrame, strataCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    val meds = df.groupBy(col(strataCol))
      .agg(round(expr(s"percentile($valueCol, 0.5)"), 4).as("med"))
    val withMed = df.select(col(strataCol), col(valueCol))
      .join(broadcast(meds), Seq(strataCol))
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    val mads = withMed.groupBy(col(strataCol))
      .agg(round(expr("percentile(__dev, 0.5)"), 4).as("mad"))
    withMed.join(broadcast(mads), Seq(strataCol))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(k) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Symmetric int8 quantization of a float embedding column, emitted as
    * per-vector integrity checksums (sum, L1, min, max of the quantized
    * codes) plus the exact max reconstruction error — the numbers a
    * storage/ANN layer audits after quantizing a shard.
    *
    * Arithmetic contract (every step an exact-rounded IEEE op, so the
    * doubles hash-match across engines):
    *   scale = max|x| / 127   (0-vectors quantize to all-zero, err 0)
    *   q_i   = floor(x_i/scale + 0.5)   (round-half-toward-+inf; an
    *           explicit formula because engines disagree on round())
    *   err   = max_i |q_i·scale − x_i|
    *
    * Shape: one narrow projection pass, O(dim) per row, zero shuffle at
    * any corpus size. The double-cast vector and its scale are
    * materialized as real columns FIRST, then each fold references those
    * attributes — referencing the un-materialized subtrees inside the
    * lambdas would re-evaluate them per element (the interpreted-HOF
    * hazard documented in SCALING.md), and CollapseProject keeps the
    * split because the subtrees are non-cheap and multiply-referenced.
    */
  def quantizeInt8Stats(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val stage1 = emb.select(col(idCol),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val stage2 = stage1.withColumn("__maxabs",
      array_max(transform(col("__v"), x => abs(x))))
    val stage3 = stage2.withColumn("__q",
      when(col("__maxabs") === 0d,
        transform(col("__v"), _ => lit(0L)))
        .otherwise(transform(col("__v"),
          x => floor(x / (col("__maxabs") / 127d) + 0.5d).cast("long"))))
    stage3.select(col(idCol),
      (col("__maxabs") / 127d).as("scale"),
      aggregate(col("__q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
      aggregate(col("__q"), lit(0L), (acc, x) => acc + abs(x)).as("q_l1"),
      array_min(col("__q")).as("q_min"),
      array_max(col("__q")).as("q_max"),
      when(col("__maxabs") === 0d, lit(0d))
        .otherwise(aggregate(
          zip_with(col("__q"), col("__v"),
            (q, x) => abs(q * (col("__maxabs") / 127d) - x)),
          lit(0d), (acc, e) => greatest(acc, e))).as("max_err"))
  }

  /** Weight-of-evidence encoding + information value per categorical
    * bucket against a binary target — the credit-scoring-lineage
    * predictive-power screen (the categorical twin of q175's χ²: χ²
    * asks "associated at all?", WOE/IV ask "how separative, and in
    * which direction?").
    *
    *   woe_b = ln( (pos_b/pos_tot) / (neg_b/neg_tot) )
    *   iv    = Σ_b (pos_b/pos_tot − neg_b/neg_tot) · woe_b
    *
    * with Laplace +1 on the bucket counts so empty-side buckets stay
    * finite (the standard zero-cell adjustment, applied to EVERY bucket
    * so the estimator is continuous). One combinable (bucket) count
    * pass; totals re-aggregate the bucket frame; ln follows the q163
    * round-6 precedent; IV's bucket-sum folds in bucket order via the
    * pinned sorted-array aggregate.
    */
  def woeEncoding(df: DataFrame, bucketCol: Column,
      labelCol: Column): DataFrame = {
    val cells = df.select(bucketCol.as("bucket"),
        labelCol.cast("long").as("y"))
      .groupBy(col("bucket"))
      .agg(sum(col("y")).as("pos"),
        (count(lit(1)) - sum(col("y"))).as("neg"))
    val tot = cells.agg(sum(col("pos")).as("pt"), sum(col("neg")).as("nt"),
      count(lit(1)).as("nb"))
    val rated = cells.crossJoin(broadcast(tot))
      .withColumn("pr", (col("pos") + 1L).cast("double") /
        (col("pt") + col("nb")).cast("double"))
      .withColumn("nr", (col("neg") + 1L).cast("double") /
        (col("nt") + col("nb")).cast("double"))
      .withColumn("woe", log(col("pr") / col("nr")))
    rated.select(col("bucket"), col("pos"), col("neg"),
      round(col("woe"), 6).as("woe"),
      round((col("pr") - col("nr")) * col("woe"), 6).as("iv_term"))
  }

  /** Leave-one-out target encoding with additive smoothing — the
    * high-cardinality categorical encoder that cannot leak the row's
    * own label:
    *
    *   te_row = (sum_y(bucket) − y_row + m·prior) / (n(bucket) − 1 + m)
    *
    * (m = smoothing pseudo-count, prior = global positive rate). The
    * bucket sums are ONE combinable aggregate joined back on the bucket
    * key — no window, no self-join; a billion-row bucket costs one
    * cell. All numerators/denominators are exact (prior enters as the
    * integer ratio pt/n scaled through m), one division per row,
    * round-6.
    */
  def looTargetEncode(df: DataFrame, idCol: Column, bucketCol: Column,
      labelCol: Column, m: Long = 10L): DataFrame = {
    val base = df.select(idCol.as("id"), bucketCol.as("bucket"),
      labelCol.cast("long").as("y"))
    val per = base.groupBy(col("bucket"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("nb"))
    val tot = per.agg(sum(col("sy")).as("pt"), sum(col("nb")).as("n"))
    base.join(per, "bucket").crossJoin(broadcast(tot))
      .select(col("id"), col("bucket"), col("y"),
        round(((col("sy") - col("y")).cast("double") +
            lit(m).cast("double") * col("pt").cast("double") /
              col("n").cast("double")) /
          ((col("nb") - 1L).cast("double") + lit(m).cast("double")), 6)
          .as("te"))
  }
}
