package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {

  private val refModels = "/root/reference"

  test("pipeline params load with the artifact shapes") {
    val p = PipelineParams.default
    assert(p.features.length == 19)
    assert(p.features.take(2) == Vector("age", "sex"))
    assert(p.imputerMedians.length == 19)
    assert(p.scalerMean.length == 19 && p.scalerScale.length == 19)
    assert(p.pcaComponents.length == 14 && p.pcaComponents.head.length == 19)
    assert(p.kmeansCenters.length == 4 && p.kmeansCenters.head.length == 14)
  }

  test("impute fills exactly the stored medians") {
    import spark.implicits._
    val p = PipelineParams.default
    val row = Seq(("p1", Some(50.0))).toDF("patient_id", "age")
    val df = p.features.tail.foldLeft(row)((acc, f) =>
      acc.withColumn(f, lit(null).cast("double")))
    val got = Scorer.impute(df, p).collect().head
    p.features.zipWithIndex.drop(1).foreach { case (f, i) =>
      assert(got.getAs[Double](f) == p.imputerMedians(i), f)
    }
    assert(got.getAs[Double]("age") == 50.0) // present values untouched
  }

  test("kmeans assigns each reconstructed center to its own cluster") {
    import spark.implicits._
    val p = PipelineParams.default
    // invert the pipeline at each center: scaled = pca_mean + Cᵀ·center_k;
    // raw = scaled·σ + μ  — orthonormal PCA rows make C·Cᵀ = I.
    val rows = p.kmeansCenters.zipWithIndex.map { case (center, k) =>
      val raw = p.features.indices.map { j =>
        val zj = p.pcaMean(j) +
          p.pcaComponents.indices.map(i => center(i) * p.pcaComponents(i)(j)).sum
        zj * p.scalerScale(j) + p.scalerMean(j)
      }
      (s"c$k", raw)
    }
    val data = rows.map { case (id, raw) => (id, raw.toArray) }
    val wide = data.toDF("patient_id", "feats")
    val named = p.features.zipWithIndex.foldLeft(wide) { case (acc, (f, j)) =>
      acc.withColumn(f, element_at(col("feats"), j + 1))
    }.drop("feats")
    val got = Scorer.addCluster(named, p)
      .select("patient_id", "cluster").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    p.kmeansCenters.indices.foreach(k => assert(got(s"c$k") == k))
  }

  test("cluster centers decode to the reference's documented semantics") {
    // Independent cross-validation of the extracted M1-M4 parameters: the
    // inverse-transformed KMeans centers must match CLUSTER_DESCRIPTIONS
    // (test.py:125-130) — 0 youngest/healthiest, 1 high-lipid, 2/3 older
    // with renal abnormality, 3 oldest.
    val p = PipelineParams.default
    def rawFeature(k: Int, name: String): Double = {
      val j = p.features.indexOf(name)
      val zj = p.pcaMean(j) +
        p.pcaComponents.indices.map(i => p.kmeansCenters(k)(i) * p.pcaComponents(i)(j)).sum
      zj * p.scalerScale(j) + p.scalerMean(j)
    }
    val ages = (0 to 3).map(rawFeature(_, "age"))
    assert(ages(0) == ages.min)            // cluster 0: youngest
    assert(ages(3) == ages.max)            // cluster 3: oldest
    val ldls = (0 to 3).map(rawFeature(_, "ldl_latest"))
    assert(ldls(1) == ldls.max && ldls(1) > 150) // cluster 1: lipid risk
    val creat = (0 to 3).map(rawFeature(_, "creatinine_latest"))
    assert(creat(3) > creat(0) && creat(2) > creat(0)) // 2/3: renal burden
  }

  test("xgb model loads 400 trees and scores deterministically") {
    val m = XgbModel.load(s"$refModels/xgb_cvd_model.json")
    assert(m.trees.length == 400)
    assert(m.numFeature == 14)
    assert(m.baseScore > 0 && m.baseScore < 1)
    val x = Array(60.0, 1.0, 18.0, 210.0, 1.1, 70.0, 105.0, 5.9, 45.0,
      41.0, 13.5, 140.0, 180.0, 1.0)
    val p1 = m.predictProb(x)
    val p2 = m.predictProb(x)
    assert(p1 == p2)
    assert(p1 > 0.0 && p1 < 1.0)
    // missing features route through default directions without crashing
    val pMissing = m.predictProb(Array.fill(14)(Double.NaN))
    assert(pMissing > 0.0 && pMissing < 1.0)
    // all three shipped models load (ckd/anemia too)
    assert(XgbModel.load(s"$refModels/xgb_ckd_model.json").trees.length == 400)
    assert(XgbModel.load(s"$refModels/xgb_anemia_model.json").trees.length == 400)
  }

  test("feature builder: age/sex decode + latest-per-analyte") {
    import spark.implicits._
    val patients = Seq(
      ("p1", "1969-03-01", "female"),
      ("p2", "1980-07-15", "M")).toDF("patient_id", "birth_date", "gender")
    val obs = Seq(
      ("o1", "p1", "Cholesterol in HDL [Mass/volume] in Serum or Plasma", 40.0, "2023-01-01T00:00:00Z"),
      ("o2", "p1", "Cholesterol in HDL [Mass/volume] in Serum or Plasma", 55.0, "2023-06-01T00:00:00Z"),
      ("o3", "p1", "Hemoglobin [Mass/volume] in Blood", 13.1, "2023-06-01T00:00:00Z"),
      ("o4", "p2", "Triglycerides", 170.0, "2023-06-01T00:00:00Z"))
      .toDF("observation_id", "patient_id", "code_display", "value_quantity",
        "effective_datetime")
    val ft = FeatureBuilder.buildFeatureTable(patients, obs, "2025-01-01")
      .collect().map(r => r.getAs[String]("patient_id") -> r).toMap
    assert(ft("p1").getAs[Double]("age") == 55.0)
    assert(ft("p1").getAs[Double]("sex") == 0.0)
    assert(ft("p1").getAs[Double]("hdl_latest") == 55.0) // newest wins
    assert(ft("p1").getAs[Double]("hemoglobin_latest") == 13.1)
    assert(ft("p2").getAs[Double]("sex") == 1.0)
    assert(ft("p2").getAs[Double]("triglycerides_latest") == 170.0)
    assert(ft("p2").getAs[Any]("hdl_latest") == null)
  }

  test("end-to-end inference from the FHIR fixture bundle") {
    val fixture = getClass.getResource("/fixtures/bundle1.json").getPath
    val (pat, _, _, obs) = graft.ingest.FhirIngest.curate(spark, fixture)
    val features = FeatureBuilder.buildFeatureTable(pat, obs)
    val out = Scorer.inferAll(spark, features, Map(
      "cvd" -> s"$refModels/xgb_cvd_model.json",
      "ckd" -> s"$refModels/xgb_ckd_model.json",
      "anemia" -> s"$refModels/xgb_anemia_model.json"))
    val rows = out.collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Int]("cluster") >= 0 && r.getAs[Int]("cluster") < 4)
      Seq("cvd_prob", "ckd_prob", "anemia_prob").foreach { c =>
        val p = r.getAs[Double](c)
        assert(p > 0.0 && p < 1.0, c)
      }
      // predm model absent -> null prob, flags still computed
      assert(r.isNullAt(r.fieldIndex("predm_prob")))
      // no HbA1c observation in the fixture and predm prob null -> the M8
      // rule must NOT fire off the imputed median (raw-lab semantics)
      assert(!r.getAs[Boolean]("q_prediabetes"))
    }
  }
}
