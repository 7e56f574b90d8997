package graft.queries

import graft.SparkSpec

class ReportsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private val HDL = "Cholesterol in HDL [Mass/volume] in Serum or Plasma"
  private val LDL = "Low Density Lipoprotein Cholesterol"
  private val TRIG = "Triglycerides"
  private val TC = "Cholesterol [Mass/volume] in Serum or Plasma"

  private def obsDf(rows: Seq[(String, String, Double, String, Long)]) = {
    import spark.implicits._
    rows.toDF("patient_id", "code_display", "value_quantity",
      "effective_datetime", "observation_seq")
  }

  test("cvd report: latest-per-key wins, bands + overall risk") {
    val df = obsDf(Seq(
      // p1: older high LDL superseded by newer optimal value
      ("p1", LDL, 180.0, "2023-01-01T00:00:00Z", 1L),
      ("p1", LDL, 90.0, "2023-06-01T00:00:00Z", 2L),
      ("p1", HDL, 65.0, "2023-06-01T00:00:00Z", 3L),
      ("p1", TRIG, 100.0, "2023-06-01T00:00:00Z", 4L),
      ("p1", TC, 150.0, "2023-06-01T00:00:00Z", 5L),
      // p2: at-risk via trig only
      ("p2", TRIG, 200.0, "2023-06-01T00:00:00Z", 6L),
      // p3: tie on timestamp -> higher seq wins
      ("p3", HDL, 30.0, "2023-06-01T00:00:00Z", 7L),
      ("p3", HDL, 45.0, "2023-06-01T00:00:00Z", 8L)))
    val out = Reports.cvdReport(df, "patient_id", "code_display",
      "value_quantity", "effective_datetime", "observation_seq",
      HDL, LDL, TRIG, TC).collect().map(r => r.getAs[String]("patient") -> r).toMap

    assert(out("p1").getAs[Double]("ldl") == 90.0)
    assert(out("p1").getAs[String]("ldl_status") == "Optimal")
    assert(out("p1").getAs[String]("hdl_status") == "Protective")
    assert(out("p1").getAs[String]("overall_cvd_risk") == "Likely normal")

    assert(out("p2").getAs[String]("triglycerides_status") == "High")
    assert(out("p2").getAs[String]("hdl_status") == "n/a")
    assert(out("p2").getAs[String]("overall_cvd_risk") == "At risk")

    assert(out("p3").getAs[Double]("hdl") == 45.0)
    assert(out("p3").getAs[String]("hdl_status") == "Normal")
  }

  test("cvd bands reproduce the reference's integer-BETWEEN gap verbatim") {
    // hdl = 59.5 falls between 'BETWEEN 40 AND 59' and '< 40'
    // (Athena_queries_for_reports.sql:39-40) -> NULL status, by design.
    val df = obsDf(Seq(("p1", HDL, 59.5, "2023-01-01T00:00:00Z", 1L)))
    val out = Reports.cvdReport(df, "patient_id", "code_display",
      "value_quantity", "effective_datetime", "observation_seq",
      HDL, LDL, TRIG, TC).collect().head
    assert(out.getAs[String]("hdl_status") == null)
  }

  test("insufficient data -> all n/a") {
    val df = obsDf(Seq(("p1", "Body height", 170.0, "2023-01-01T00:00:00Z", 1L)))
    val out = Reports.cvdReport(df, "patient_id", "code_display",
      "value_quantity", "effective_datetime", "observation_seq",
      HDL, LDL, TRIG, TC).collect()
    assert(out.isEmpty) // filtered out entirely: no CVD analytes at all
  }

  test("t2d report: qualitative urine branch lower/trims and prioritizes") {
    import spark.implicits._
    val A1C = "Hemoglobin A1c/Hemoglobin.total in Blood"
    val GLU = "Glucose [Mass/volume] in Blood"
    val URI = "Glucose [Presence] in Urine by Test strip"
    val df = Seq(
      ("p1", A1C, Some(6.0), None: Option[String], "2023-01-01T00:00:00Z", 1L),
      ("p1", URI, None: Option[Double], Some(" Positive "), "2023-01-02T00:00:00Z", 2L),
      ("p2", GLU, Some(80.0), None: Option[String], "2023-01-01T00:00:00Z", 3L))
      .toDF("patient_id", "code_display", "value_quantity", "value_string",
        "effective_datetime", "observation_seq")
    val out = Reports.t2dReport(df, "patient_id", "code_display",
      "value_quantity", "value_string", "effective_datetime", "observation_seq",
      A1C, GLU, Seq(URI, "Glucose [Mass/volume] in Urine by Test strip"))
      .collect().map(r => r.getAs[String]("patient") -> r).toMap
    assert(out("p1").getAs[String]("glucose_urine_txt") == "positive")
    assert(out("p1").getAs[String]("glucose_urine_status") == "Abnormal")
    // positive urine overrides prediabetic a1c in the overall CASE
    assert(out("p1").getAs[String]("overall_t2d_risk")
      == "Diabetes likely (lab criteria met)")
    assert(out("p2").getAs[String]("glucose_blood_status") == "Normal")
    assert(out("p2").getAs[String]("overall_t2d_risk") == "Normal")
  }
}
