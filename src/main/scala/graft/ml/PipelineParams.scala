package graft.ml

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Numeric parameters of the reference's fitted sklearn pipeline, extracted
  * from the joblib artifacts (`imputer.joblib`, `scaler.joblib`,
  * `pca_14components.joblib`, `kmeans_k4.joblib` — see
  * tools/extract_artifacts.py) into a plain JSON resource. Exact numeric
  * parity with zero sklearn dependency (SURVEY.md §2.5 M1-M4).
  */
final case class PipelineParams(
    features: Vector[String],             // 19 input columns, order fixed
    imputerMedians: Vector[Double],       // M1: SimpleImputer(median)
    scalerMean: Vector[Double],           // M2: StandardScaler μ
    scalerScale: Vector[Double],          // M2: StandardScaler σ
    pcaMean: Vector[Double],              // M3: PCA centering (in scaled space)
    pcaComponents: Vector[Vector[Double]],// M3: (14, 19)
    kmeansCenters: Vector[Vector[Double]])// M4: (4, 14) in PCA space

object PipelineParams {
  implicit private val formats: Formats = DefaultFormats

  lazy val default: PipelineParams = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/ml/pipeline_params.json"))
    val json = try JsonMethods.parse(src.mkString) finally src.close()
    PipelineParams(
      (json \ "features").extract[Vector[String]],
      (json \ "imputer_medians").extract[Vector[Double]],
      (json \ "scaler_mean").extract[Vector[Double]],
      (json \ "scaler_scale").extract[Vector[Double]],
      (json \ "pca_mean").extract[Vector[Double]],
      (json \ "pca_components").extract[Vector[Vector[Double]]],
      (json \ "kmeans_centers").extract[Vector[Vector[Double]]])
  }

  /** The 14 model input columns — feature_columns.json:1 verbatim. */
  val modelColumns: Vector[String] = Vector(
    "age", "sex", "bun_latest", "cholesterol_total_latest",
    "creatinine_latest", "egfr_latest", "glucose_latest", "hba1c_latest",
    "hdl_latest", "hematocrit_latest", "hemoglobin_latest", "ldl_latest",
    "triglycerides_latest", "cluster")
}
