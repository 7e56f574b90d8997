package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shape-tolerant FHIR extraction — the reference's actual strategy
  * (Glue_tranformation_json_parquet.py:28-49): schema-on-read (inferred),
  * then JSONPath coalesce ladders over re-serialized structs so that
  * CodeableConcepts appearing as single structs OR arrays (at both the CC
  * and coding level) all extract. Use when bundles come from heterogeneous
  * producers; [[FhirIngest]]'s declared-schema path is the fast lane for
  * conformant FHIR R4.
  *
  * Trade-off documented in SURVEY.md §4: `to_json` + `get_json_object` is
  * O(paths) string work per row — correct but not codegen-friendly.
  * Observation extraction keeps the reference's exact value[x] priority
  * order (`:165-176`).
  */
object LenientFhir {
  import FhirIngest.{jget, refToUuid}

  /** Extract a field's JSON text from the serialized parent. Two-level
    * extraction is the load-bearing trick: when JSON inference hits
    * conflicting shapes for a field (struct in one doc, array in another),
    * Spark types the field as a plain string holding the raw JSON — and
    * get_json_object unwraps that string back to JSON text, so a second
    * get_json_object can keep navigating. One-shot paths like
    * `$.code.coding[0].display` would die at the stringified boundary.
    */
  def fieldJson(parent: Column, field: String): Column =
    get_json_object(to_json(parent), s"$$.$field")

  private def gjo(json: Column, paths: String*): Column =
    coalesce(paths.map(p => get_json_object(json, p)): _*)

  /** cc_attr (reference :34-40): tolerate array-or-single at both levels. */
  def ccAttr(parent: Column, field: String, attr: String): Column =
    gjo(fieldJson(parent, field),
      s"$$.coding[0].$attr", s"$$.coding.$attr",
      s"$$[0].coding[0].$attr", s"$$[0].coding.$attr")

  /** cc_text (reference :43-46). */
  def ccText(parent: Column, field: String): Column =
    gjo(fieldJson(parent, field), "$.text", "$[0].text")

  def ccDisplay(parent: Column, field: String): Column =
    ccAttr(parent, field, "display")

  def readBundles(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .option("recursiveFileLookup", "true")
      .json(path) // inferred schema — tolerant of any shape drift

  def entries(bundles: DataFrame): DataFrame =
    bundles.select(explode_outer(col("entry")).as("e"))
      .select(col("e.resource").as("resource"))

  /** Observations via the pure-jget path (works whatever shape inference
    * produced). Returns the same column contract as
    * FhirIngest.observations.
    */
  def observations(entries: DataFrame): DataFrame = {
    val r = col("resource")
    entries
      .filter(jget(r, "$.resourceType") === "Observation")
      .select(
        jget(r, "$.id").as("observation_id"),
        refToUuid(jget(r, "$.subject.reference")).as("patient_id"),
        refToUuid(jget(r, "$.encounter.reference")).as("encounter_id"),
        jget(r, "$.status").as("status"),
        ccDisplay(r, "category").as("category"),
        ccAttr(r, "code", "system").as("code_system"),
        ccAttr(r, "code", "code").as("code"),
        ccAttr(r, "code", "display").as("code_display"),
        // numeric choice: double/int branches then raw JSON value
        // (reference :141-147) — two-level to survive stringified structs
        gjo(fieldJson(r, "valueQuantity"),
          "$.value.double", "$.value.int", "$.value")
          .cast("double").as("value_quantity"),
        get_json_object(fieldJson(r, "valueQuantity"), "$.unit").as("value_unit"),
        coalesce(
          jget(r, "$.valueString"),
          ccAttr(r, "valueCodeableConcept", "display"),
          ccText(r, "valueCodeableConcept"),
          jget(r, "$.valueInteger"),
          jget(r, "$.valueBoolean"),
          jget(r, "$.valueDateTime"),
          jget(r, "$.valueTime"),
          jget(r, "$.valuePeriod.start"),
          jget(r, "$.valueRange.low.value"),
          jget(r, "$.valueSampledData.data")).as("value_string"),
        jget(r, "$.effectiveDateTime").as("effective_datetime"))
      .dropDuplicates("observation_id")
  }
}
