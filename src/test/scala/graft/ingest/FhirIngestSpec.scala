package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.Row

class FhirIngestSpec extends SparkSpec {

  private lazy val fixture =
    getClass.getResource("/fixtures/bundle1.json").getPath

  private lazy val (pat, enc, cond, obs) = FhirIngest.curate(spark, fixture)

  test("curate leaves no persisted RDDs behind (shared shuffle, not cache)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val (p, e, c, o) = FhirIngest.curate(spark, fixture)
    assert(p.count() + e.count() + c.count() + o.count() > 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"curate leaked persisted RDD ids: $leaked")
  }

  test("patient extraction: nested address, geo, race/ethnicity, line join") {
    val rows = pat.orderBy("patient_id").collect()
    assert(rows.length == 2)
    val p1 = rows(0)
    assert(p1.getAs[String]("patient_id") == "pat-1")
    assert(p1.getAs[String]("gender") == "female")
    assert(p1.getAs[String]("birth_date") == "1969-03-01")
    assert(p1.getAs[String]("address_line") == "12 Main St|Apt 4")
    assert(p1.getAs[String]("address_city") == "Toronto")
    assert(p1.getAs[Double]("geo_lat") == 43.7)
    assert(p1.getAs[Double]("geo_lon") == -79.4)
    assert(p1.getAs[String]("race") == "white")
    assert(p1.getAs[String]("ethnicity") == "nonhispanic")
    // pat-2 has no address: all address fields null, no failure
    val p2 = rows(1)
    assert(p2.getAs[String]("address_line") == null)
    assert(p2.getAs[String]("country") == null)
  }

  test("encounter extraction: FK uuid regex, period, participant paths") {
    val e = enc.collect().head
    assert(e.getAs[String]("encounter_id") == "enc-1")
    assert(e.getAs[String]("patient_id") == "pat-1")
    assert(e.getAs[String]("class_code") == "AMB")
    assert(e.getAs[String]("type_text") == "General examination")
    assert(e.getAs[String]("period_start") == "2023-01-05T10:00:00Z")
    assert(e.getAs[String]("location_name") == "Clinic A")
    assert(e.getAs[String]("practitioner_name") == "Dr. Smith")
    assert(e.getAs[String]("practitioner_role") == "primary")
  }

  test("condition extraction: CC attrs and both FKs") {
    val c = cond.collect().head
    assert(c.getAs[String]("condition_id") == "cond-1")
    assert(c.getAs[String]("patient_id") == "pat-1")
    assert(c.getAs[String]("encounter_id") == "enc-1")
    assert(c.getAs[String]("code") == "44054006")
    assert(c.getAs[String]("code_display") == "Diabetes mellitus type 2")
    assert(c.getAs[String]("clinical_status") == "active")
    assert(c.getAs[String]("verification_status") == "confirmed")
  }

  test("observation extraction: dedup on id + value[x] choice coalesce") {
    val rows = obs.orderBy("observation_id").collect()
    // obs-1 appears twice in the bundle -> deduped (reference
    // Glue_tranformation_json_parquet.py:183)
    assert(rows.length == 4)
    val byId = rows.map(r => r.getAs[String]("observation_id") -> r).toMap
    // numeric valueQuantity
    assert(byId("obs-1").getAs[Double]("value_quantity") == 52.3)
    assert(byId("obs-1").getAs[String]("value_unit") == "mg/dL")
    assert(byId("obs-1").getAs[String]("code_display")
      == "Cholesterol in HDL [Mass/volume] in Serum or Plasma")
    // valueString kept as-is (no trim at ingest; reports lower/trim later)
    assert(byId("obs-2").getAs[String]("value_string") == " Negative ")
    assert(byId("obs-2").getAs[Any]("value_quantity") == null)
    // valueCodeableConcept display wins over text (reference :167-168)
    assert(byId("obs-3").getAs[String]("value_string") == "Never smoker")
    // valueInteger stringified (reference :169)
    assert(byId("obs-4").getAs[String]("value_string") == "9000")
    // FK extraction without encounter ref -> empty string from regex on null
    assert(byId("obs-2").getAs[String]("patient_id") == "pat-1")
  }
}
