package graft.wellness

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WellnessSpec extends SparkSpec {

  private def score1(analytes: Map[String, Double]): org.apache.spark.sql.Row = {
    import spark.implicits._
    val all = Wellness.Refs.keys.toSeq.sorted
    val df0 = Seq(1).toDF("id")
    val df = all.foldLeft(df0) { (acc, a) =>
      acc.withColumn(a, analytes.get(a).map(lit).getOrElse(lit(null).cast("double")))
    }
    Wellness.scoreWide(df, identity).collect().head
  }

  test("penalty bin edges are exclusive-upper (value < edge)") {
    import spark.implicits._
    val df = Seq(99.9, 100.0, 129.9, 130.0, 160.0, 250.0).toDF("v")
    val got = df.select(Wellness.penalty(col("v"), Wellness.Refs("LDL")).as("p"))
      .collect().map(_.getInt(0)).toSeq
    // penalty_for_value: value < next edge (mrp_website.py:176-180)
    assert(got == Seq(0, 1, 1, 2, 3, 3))
  }

  test("perfect labs -> wellness 100, full confidence") {
    val r = score1(Map(
      "LDL" -> 90, "HDL" -> 50, "Triglycerides" -> 100, "TotalChol" -> 150,
      "A1c" -> 5.0, "GlucoseBlood" -> 90,
      "eGFR" -> 95, "Creatinine" -> 1.0, "BUN" -> 15,
      "Hemoglobin" -> 14, "Hematocrit" -> 40,
      "ALT" -> 20, "AST" -> 20, "Bilirubin" -> 0.5, "Albumin" -> 4.0))
    assert(r.getAs[Double]("wellness") == 100.0)
    assert(math.abs(r.getAs[Double]("confidence") - 1.0) < 1e-12)
    assert(r.getSeq[String](r.fieldIndex("patterns")).isEmpty)
  }

  test("subscore renormalizes over present analytes only") {
    // only LDL present (w=0.40), penalty 2 (130<=145<160):
    // weighted = 2*0.40 = 0.8 over mass 0.40 -> but the reference does NOT
    // divide by mass inside a disease: sub = 100 - 0.8*100/3 = 73.333...
    val r = score1(Map("LDL" -> 145.0))
    val sub = r.getAs[Double]("sub_cardiovascular")
    assert(math.abs(sub - (100.0 - 0.8 * 100.0 / 3.0)) < 1e-9)
    // wellness = sub (only cardio present), confidence = 0.25
    assert(math.abs(r.getAs[Double]("wellness") - sub) < 1e-9)
    assert(math.abs(r.getAs[Double]("confidence") - 0.25) < 1e-12)
  }

  test("no labs -> null wellness, zero confidence") {
    val r = score1(Map.empty)
    assert(r.isNullAt(r.fieldIndex("wellness")))
    assert(r.getAs[Double]("confidence") == 0.0)
  }

  test("liver summary tiers by count of penalty>=2 abnormalities") {
    // ALT 60 (pen 2) + Bilirubin 2.0 (pen 2) -> multiple
    assert(score1(Map("ALT" -> 60.0, "Bilirubin" -> 2.0))
      .getAs[String]("liver_summary")
      == "Liver dysfunction likely (multiple abnormalities)")
    assert(score1(Map("ALT" -> 60.0, "AST" -> 20.0))
      .getAs[String]("liver_summary") == "Possible liver dysfunction")
    assert(score1(Map("ALT" -> 20.0)).getAs[String]("liver_summary")
      == "No liver dysfunction signal")
    assert(score1(Map("LDL" -> 100.0)).getAs[String]("liver_summary")
      == "Insufficient data")
  }

  test("patterns fire per the reference rules") {
    val r = score1(Map("LDL" -> 165.0, "HDL" -> 50.0, "Hemoglobin" -> 11.0,
      "eGFR" -> 50.0, "Creatinine" -> 1.0))
    val p = r.getSeq[String](r.fieldIndex("patterns"))
    assert(p.contains("high_ldl_low_hdl"))
    assert(p.contains("low_hemoglobin"))
    assert(p.contains("low_egfr_high_creatinine"))
    assert(!p.contains("elevated_a1c_glucose"))
  }
}
