package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LenientAndPanelSpec extends SparkSpec {

  test("lenient path tolerates every shape variant the reference handles") {
    val fixture = getClass.getResource("/fixtures/bundle2_variants.json").getPath
    val obs = LenientFhir.observations(
      LenientFhir.entries(LenientFhir.readBundles(spark, fixture)))
      .collect().map(r => r.getAs[String]("observation_id") -> r).toMap
    // Glue-style choice struct value.{double,int} (reference :141-147)
    assert(obs("v1").getAs[Double]("value_quantity") == 52.5)
    assert(obs("v1").getAs[String]("code_display")
      == "Cholesterol in HDL [Mass/volume] in Serum or Plasma")
    assert(obs("v2").getAs[Double]("value_quantity") == 170.0)
    // CC as array at the CC level (code: [...]) — jget $[0] branch... the
    // $.code[0] path resolves display through the array wrapper
    assert(obs("v2").getAs[String]("code_display") == "Body height")
    // coding as single struct, not array (reference :38 branch)
    assert(obs("v3").getAs[String]("code_display") == "Smoking status")
    // valueCodeableConcept display wins; valueBoolean stringifies
    assert(obs("v3").getAs[String]("value_string") == "Never smoker")
    assert(obs("v4").getAs[String]("value_string") == "true")
    // FK regex works through the jget path
    assert(obs("v1").getAs[String]("patient_id") == "pat-9")
  }

  test("lab-panel CSV: optional columns, synthesized dates, confidence, scoring") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    // CSV with a subset of analytes and no date column
    Seq(
      ("P001", 168.0, 38.0), ("P001", 150.0, 42.0), ("P001", 135.0, 48.0))
      .toDF("patient_id", "LDL", "HDL")
      .coalesce(1).write.option("header", "true").csv(s"$dir/panel")
    val panel = LabPanel.read(spark, s"$dir/panel", today = "2025-01-01")
    // all 15 analytes present as columns; absent ones typed-null
    LabPanel.analytes.foreach(a => assert(panel.columns.contains(a), a))
    assert(panel.filter(col("A1c").isNotNull).count() == 0)
    // synthesized daily dates end at `today`
    val dates = panel.orderBy("date").select("date").collect()
      .map(_.getDate(0).toString)
    assert(dates.last == "2024-12-31" || dates.last == "2025-01-01")
    assert(dates.distinct.length == 3)

    // confidence: CVD has LDL+HDL present in last 4 -> High; CKD none -> Low
    val cvdConf = LabPanel.diseaseConfidence(panel, "Cardiovascular")
      .collect().head.getAs[String]("confidence")
    val ckdConf = LabPanel.diseaseConfidence(panel, "CKD")
      .collect().head.getAs[String]("confidence")
    assert(cvdConf == "High")
    assert(ckdConf == "Low")

    // latest row scored: wellness present, only cardio contributes
    val scored = LabPanel.latestScored(panel).collect().head
    assert(!scored.isNullAt(scored.fieldIndex("wellness")))
    assert(scored.getAs[Double]("confidence") == 0.25)
  }
}
