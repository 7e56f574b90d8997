package graft.suite

import org.apache.spark.sql.functions._
import graft.core.{GQuery, Tables => T}
import graft.ml.{PipelineParams, Scorer}
import graft.queries.Reports

/** DuckDB-oracle coverage for the ML numeric core (SURVEY §2.5 M1-M5): the
  * impute → standardize → PCA(14) → KMeans-assign pipeline is pure
  * arithmetic over broadcast constants, so its DuckDB mirror is generated
  * from the SAME PipelineParams instance with the same left-fold operation
  * order — doubles are bit-identical before the final rounding (the q27
  * unrolled-fold pattern).
  *
  * The 19-column feature frame is synthesized deterministically from the
  * events table: age/sex from user_id arithmetic, the 17 lab columns fed
  * round-robin from the 5-analyte latest-per-key pivot (missing pivots →
  * NULL → exercises M1 imputation on real gaps).
  */
object MlQueries {

  /** Constants rendered as CAST('<shortest-repr>' AS DOUBLE): text→double
    * parsing is correctly rounded on both engines, whereas a bare SQL
    * numeric literal becomes DECIMAL in DuckDB and can double-round on the
    * way to float64 for 15+ digit constants.
    */
  private def d(x: Double): String = s"CAST('$x' AS DOUBLE)"

  private val q37 = GQuery(
    (s, dir) => {
      val p = PipelineParams.default
      val piv = Reports.pivotLatest(T.events(s, dir), "user_id", "event_type",
        "value", "ts", "event_id",
        Seq("v0" -> "click", "v1" -> "view", "v2" -> "purchase",
          "v3" -> "error", "v4" -> "signup"))
      val base = piv
        .withColumn("age", (col("user_id") % 60 + 20).cast("double"))
        .withColumn("sex", (col("user_id") % 2).cast("double"))
      val withLabs = p.features.drop(2).zipWithIndex.foldLeft(base) {
        case (acc, (f, j)) => acc.withColumn(f, col(s"v${j % 5}"))
      }
      val features = withLabs.select(col("user_id") +: p.features.map(col): _*)
      Scorer.addCluster(Scorer.impute(features, p), p, keepY = true)
        .select(col("user_id"), col("cluster").cast("long").as("cluster"),
          round(element_at(col("pca_y"), 1), 6).as("pca1"))
        .orderBy(col("user_id"))
    },
    Some {
      val p = PipelineParams.default
      // imputed feature expressions, keyed by feature name
      val srcExpr: Map[String, String] =
        (Seq("age" -> "CAST(user_id % 60 + 20 AS DOUBLE)",
          "sex" -> "CAST(user_id % 2 AS DOUBLE)") ++
          p.features.drop(2).zipWithIndex.map { case (f, j) => f -> s"v${j % 5}" }).toMap
      val imputed = p.features.zipWithIndex.map { case (f, j) =>
        s"COALESCE(${srcExpr(f)}, ${d(p.imputerMedians(j))}) AS $f"
      }.mkString(", ")
      // scaled_j = (x_j - mu_j) / sigma_j - pm_j  (M2 + PCA centering)
      val scaled = p.features.zipWithIndex.map { case (f, j) =>
        s"(($f - ${d(p.scalerMean(j))}) / ${d(p.scalerScale(j))} - ${d(p.pcaMean(j))})"
      }
      // y_i = left-fold sum of scaled_j * C[i][j]  (same order as Scorer's reduce)
      val ys = p.pcaComponents.zipWithIndex.map { case (comp, i) =>
        val sum = comp.zip(scaled).map { case (c, sc) => s"$sc * ${d(c)}" }
          .reduceLeft((a, b) => s"($a + $b)")
        s"$sum AS y${i + 1}"
      }.mkString(", ")
      // dist2_k = left-fold sum of (y_i - c_ki)^2
      val dists = p.kmeansCenters.zipWithIndex.map { case (center, k) =>
        val sum = center.zipWithIndex.map { case (c, i) =>
          s"((y${i + 1} - ${d(c)}) * (y${i + 1} - ${d(c)}))"
        }.reduceLeft((a, b) => s"($a + $b)")
        s"$sum AS dist$k"
      }.mkString(", ")
      val distCols = p.kmeansCenters.indices.map(k => s"dist$k").mkString(", ")
      val minD = (0 until p.kmeansCenters.length).map(k => s"dist$k")
        .reduceLeft((a, b) => s"LEAST($a, $b)")
      val armK = (0 until p.kmeansCenters.length)
        .map(k => s"WHEN dist$k = mind THEN $k").mkString(" ")
      s"""WITH latest AS (
        SELECT user_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
        WHERE event_type IN ('click', 'view', 'purchase', 'error', 'signup')),
      pvt AS (
        SELECT user_id,
          MAX(CASE WHEN event_type = 'click' THEN TRY_CAST(value AS DOUBLE) END) AS v0,
          MAX(CASE WHEN event_type = 'view' THEN TRY_CAST(value AS DOUBLE) END) AS v1,
          MAX(CASE WHEN event_type = 'purchase' THEN TRY_CAST(value AS DOUBLE) END) AS v2,
          MAX(CASE WHEN event_type = 'error' THEN TRY_CAST(value AS DOUBLE) END) AS v3,
          MAX(CASE WHEN event_type = 'signup' THEN TRY_CAST(value AS DOUBLE) END) AS v4
        FROM latest WHERE rn = 1 GROUP BY user_id),
      feat AS (SELECT user_id, $imputed FROM pvt),
      proj AS (SELECT user_id, $ys FROM feat),
      dst AS (SELECT user_id, y1, $dists FROM proj),
      m AS (SELECT user_id, y1, $distCols, $minD AS mind FROM dst)
      SELECT user_id,
        CAST(CASE $armK END AS BIGINT) AS cluster,
        ROUND(y1, 6) AS pca1
      FROM m ORDER BY user_id"""
    })

  def all: Map[String, GQuery] = Map(
    "q37_ml_cluster_pipeline" -> q37,
  )
}
