package graft.wellness

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F11/F12 banding semantics (test.py:166-193): all five bands, both exact
  * boundary multipliers, null handling, emoji and severity decoration, and
  * the distributed build_lab_summary unpivot.
  */
class LabInfoSpec extends SparkSpec {

  private def statusOf(key: String, value: java.lang.Double): String = {
    import spark.implicits._
    val r = LabInfo.byKey(key)
    Seq(Option(value).map(_.doubleValue)).toDF("v")
      .select(LabInfo.statusFromLabValue(col("v"), r.low, r.high).as("s"))
      .collect().head.getString(0)
  }

  test("five bands with exact boundary multipliers (glucose 70/140)") {
    // low*0.9 = 63, high*1.2 = 168; < is strict, <= inclusive
    assert(statusOf("glucose_latest", 62.9) == "Low")
    assert(statusOf("glucose_latest", 63.0) == "Borderline low") // == low*0.9
    assert(statusOf("glucose_latest", 69.9) == "Borderline low")
    assert(statusOf("glucose_latest", 70.0) == "In range")       // == low
    assert(statusOf("glucose_latest", 140.0) == "In range")      // == high
    assert(statusOf("glucose_latest", 140.1) == "Borderline high")
    assert(statusOf("glucose_latest", 168.0) == "Borderline high") // == high*1.2
    assert(statusOf("glucose_latest", 168.1) == "High")
    assert(statusOf("glucose_latest", null) == "Unknown")
  }

  test("fractional bounds band correctly (creatinine 0.4/1.3)") {
    // low*0.9 computed in IEEE double: 0.4*0.9 = 0.36000000000000004
    assert(statusOf("creatinine_latest", 0.359) == "Low")
    assert(statusOf("creatinine_latest", 0.36000000000000004) == "Borderline low")
    assert(statusOf("creatinine_latest", 1.3) == "In range")
    assert(statusOf("creatinine_latest", 1.56) == "Borderline high") // 1.3*1.2
    assert(statusOf("creatinine_latest", 1.57) == "High")
  }

  test("zero-low analytes never go Low (ldl 0/130)") {
    assert(statusOf("ldl_latest", 0.0) == "In range")
    assert(statusOf("ldl_latest", 130.0) == "In range")
    assert(statusOf("ldl_latest", 156.0) == "Borderline high")
    assert(statusOf("ldl_latest", 156.1) == "High")
  }

  test("emoji and severity decoration (test.py:186-193,528-535)") {
    import spark.implicits._
    val got = Seq("In range", "Borderline high", "Borderline low", "High",
      "Low", "Unknown").toDF("s")
      .select(col("s"), LabInfo.statusEmoji(col("s")).as("e"),
        LabInfo.severityRank(col("s")).as("r"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(got("In range") == (("🟢", 2)))
    assert(got("Borderline high") == (("🟡", 1)))
    assert(got("Borderline low") == (("🟡", 1)))
    assert(got("High") == (("🔴", 0)))
    assert(got("Low") == (("🔴", 0)))
    assert(got("Unknown") == (("⚪️", 3)))
  }

  test("labSummary unpivots one row per known analyte column per patient") {
    import spark.implicits._
    val features = Seq(
      ("p1", Some(100.0), Some(5.0), None: Option[Double]),
      ("p2", None: Option[Double], Some(20.0), Some(13.0)))
      .toDF("patient_id", "glucose_latest", "hba1c_latest", "hemoglobin_latest")
      .withColumn("not_a_lab", lit(1)) // ignored: not in LAB_INFO
    val got = LabInfo.labSummary(features, "patient_id").collect()
    assert(got.length == 6) // 2 patients x 3 known analyte columns
    val byPk = got.map(r => (r.getString(0), r.getAs[String]("lab_key")) -> r).toMap
    assert(byPk(("p1", "glucose_latest")).getAs[String]("status") == "In range")
    assert(byPk(("p1", "hba1c_latest")).getAs[String]("status") == "In range")
    assert(byPk(("p1", "hemoglobin_latest")).getAs[String]("status") == "Unknown")
    assert(byPk(("p2", "hba1c_latest")).getAs[String]("status") == "High") // 20 > 5.6*1.2
    assert(byPk(("p2", "hemoglobin_latest")).getAs[String]("status") == "In range")
    assert(byPk(("p2", "glucose_latest")).getAs[String]("value") == null)
    // reference range metadata travels with the row
    val g = byPk(("p1", "glucose_latest"))
    assert(g.getAs[String]("lab") == "Glucose" && g.getAs[String]("unit") == "mg/dL")
    assert(g.getAs[Double]("ref_low") == 70.0 && g.getAs[Double]("ref_high") == 140.0)
  }
}
