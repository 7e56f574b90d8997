package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** L1 ETL: FHIR R4 JSON Bundles → 4 curated flat tables (patient, encounter,
  * condition, observation), with the exact output column contracts of the
  * reference Glue job (`Glue_tranformation_json_parquet.py:58-199`).
  *
  * Spark-first design decisions (vs the reference):
  *  - a hand-declared permissive schema ([[bundleSchema]]) instead of Glue
  *    DynamicFrame inference — fixes the array/struct shapes up front, so
  *    extraction is direct struct access (codegen'd, no per-row JSON
  *    re-serialization). The reference's `jget` / `cc_attr` coalesce ladders
  *    (`:28-49`) exist to tolerate inference drift; with a declared schema
  *    those shapes cannot drift. A `jget`-style fallback is still provided
  *    for schema-less exploration.
  *  - Glue's numeric "choice struct" `valueQuantity.value.{double,int}`
  *    (`:141-147`) collapses to a plain DoubleType under the declared
  *    schema; the coalesce survives only as documentation.
  *  - dedup per entity id (`:92,116,137,183`) is a deterministic
  *    keep-first-by-id window, not order-dependent dropDuplicates.
  *
  * Scale: the bundle scan is a distributed JSON read (recursiveFileLookup);
  * each extractor is filter+project (narrow); the only shuffle per table is
  * the dedup exchange on the entity id — high-cardinality UUIDs, even
  * spread. At 100 TB, partition output by e.g. month(effective_datetime).
  */
object FhirIngest {

  private val extensionT = ArrayType(StructType(Seq(
    StructField("url", StringType),
    StructField("extension", ArrayType(StructType(Seq(
      StructField("url", StringType),
      StructField("valueDecimal", DoubleType),
      StructField("valueString", StringType))))))))

  private val codingT = ArrayType(StructType(Seq(
    StructField("system", StringType),
    StructField("code", StringType),
    StructField("display", StringType))))

  private val ccT = StructType(Seq(
    StructField("coding", codingT),
    StructField("text", StringType)))

  private val refT = StructType(Seq(StructField("reference", StringType)))

  /** Permissive union schema for all four resource types (FHIR R4 shapes
    * pinned by the reference's access paths, Glue_tranformation_json_parquet
    * .py:66-184 and FIXTURES.md).
    */
  val resourceSchema: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    // Patient
    StructField("gender", StringType),
    StructField("birthDate", StringType),
    StructField("address", ArrayType(StructType(Seq(
      StructField("line", ArrayType(StringType)),
      StructField("city", StringType),
      StructField("state", StringType),
      StructField("postalCode", StringType),
      StructField("country", StringType),
      StructField("extension", extensionT))))),
    StructField("extension", extensionT),
    // Encounter
    StructField("subject", refT),
    StructField("status", StringType),
    StructField("class", StructType(Seq(StructField("code", StringType)))),
    StructField("type", ArrayType(ccT)),
    StructField("period", StructType(Seq(
      StructField("start", StringType), StructField("end", StringType)))),
    StructField("location", ArrayType(StructType(Seq(
      StructField("location", StructType(Seq(StructField("display", StringType)))))))),
    StructField("serviceProvider", StructType(Seq(StructField("display", StringType)))),
    StructField("participant", ArrayType(StructType(Seq(
      StructField("individual", StructType(Seq(StructField("display", StringType)))),
      StructField("type", ArrayType(StructType(Seq(StructField("text", StringType))))))))),
    // Condition
    StructField("encounter", refT),
    StructField("code", ccT),
    StructField("clinicalStatus", ccT),
    StructField("verificationStatus", ccT),
    StructField("onsetDateTime", StringType),
    StructField("recordedDate", StringType),
    // Observation
    StructField("category", ArrayType(ccT)),
    StructField("valueQuantity", StructType(Seq(
      StructField("value", DoubleType), StructField("unit", StringType)))),
    StructField("valueCodeableConcept", ccT),
    StructField("valueString", StringType),
    StructField("valueInteger", LongType),
    StructField("valueBoolean", BooleanType),
    StructField("valueDateTime", StringType),
    StructField("valueTime", StringType),
    StructField("valuePeriod", StructType(Seq(
      StructField("start", StringType), StructField("end", StringType)))),
    StructField("valueRange", StructType(Seq(
      StructField("low", StructType(Seq(StructField("value", DoubleType))))))),
    StructField("valueSampledData", StructType(Seq(StructField("data", StringType)))),
    StructField("effectiveDateTime", StringType)))

  val bundleSchema: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("entry", ArrayType(StructType(Seq(
      StructField("resource", resourceSchema)))))))

  /** FHIR reference "urn:uuid:<id>" → id (ref_to_uuid, reference :24-26). */
  def refToUuid(c: Column): Column =
    regexp_extract(c, "urn:uuid:([A-Za-z0-9-]+)", 1)

  /** JSONPath fallback extractor over a re-serialized struct (jget,
    * reference :28-31) — kept for schema-less exploration paths; the
    * declared-schema extractors below never need it.
    */
  def jget(c: Column, paths: String*): Column =
    coalesce(paths.map(p => get_json_object(to_json(c), p)): _*)

  /** Read bundles (one JSON document per file, recursively). */
  def readBundles(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("multiLine", "true")
      .option("recursiveFileLookup", "true")
      .schema(bundleSchema)
      .json(path)

  /** Bundle → one row per entry resource (explode_outer, reference :60-66). */
  def entries(bundles: DataFrame): DataFrame =
    bundles.select(explode_outer(col("entry")).as("e"))
      .select(col("e.resource").as("resource"))
      .select("resource.*")

  /** Deterministic dedup: first row per id ordered by all output columns —
    * reproducible under any partitioning (vs dropDuplicates' "whichever
    * partition wins").
    */
  private def dedupOn(df: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orderCols = df.columns.filterNot(_ == idCol).map(c => col(c).asc_nulls_last)
    val w = Window.partitionBy(col(idCol)).orderBy(orderCols.toIndexedSeq: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private def ccAttr(c: Column, attr: String): Column =
    c.getField("coding").getItem(0).getField(attr)
  private def ccText(c: Column): Column = c.getField("text")

  /** PATIENT (reference :68-93). */
  def patients(flat: DataFrame): DataFrame = {
    val addr0 = col("address").getItem(0)
    dedupOn(
      flat.filter(col("resourceType") === "Patient")
        .select(
          col("id").as("patient_id"),
          col("gender"),
          col("birthDate").as("birth_date"),
          when(addr0.getField("line").isNotNull,
            array_join(addr0.getField("line"), "|")).as("address_line"),
          addr0.getField("city").as("address_city"),
          addr0.getField("state").as("address_state"),
          addr0.getField("postalCode").as("address_postal"),
          addr0.getField("country").as("country"),
          addr0.getField("extension").getItem(0).getField("extension").getItem(0)
            .getField("valueDecimal").as("geo_lat"),
          addr0.getField("extension").getItem(0).getField("extension").getItem(1)
            .getField("valueDecimal").as("geo_lon"),
          col("extension").getItem(0).getField("extension").getItem(1)
            .getField("valueString").as("race"),
          col("extension").getItem(1).getField("extension").getItem(1)
            .getField("valueString").as("ethnicity")),
      "patient_id")
  }

  /** ENCOUNTER (reference :95-117). */
  def encounters(flat: DataFrame): DataFrame =
    dedupOn(
      flat.filter(col("resourceType") === "Encounter")
        .select(
          col("id").as("encounter_id"),
          refToUuid(col("subject.reference")).as("patient_id"),
          col("status"),
          col("class.code").as("class_code"),
          col("type").getItem(0).getField("text").as("type_text"),
          col("period.start").as("period_start"),
          col("period.end").as("period_end"),
          col("location").getItem(0).getField("location").getField("display")
            .as("location_name"),
          col("serviceProvider.display").as("service_provider"),
          col("participant").getItem(0).getField("individual").getField("display")
            .as("practitioner_name"),
          col("participant").getItem(0).getField("type").getItem(0).getField("text")
            .as("practitioner_role")),
      "encounter_id")

  /** CONDITION (reference :119-138). */
  def conditions(flat: DataFrame): DataFrame =
    dedupOn(
      flat.filter(col("resourceType") === "Condition")
        .select(
          col("id").as("condition_id"),
          refToUuid(col("subject.reference")).as("patient_id"),
          refToUuid(col("encounter.reference")).as("encounter_id"),
          ccAttr(col("code"), "system").as("code_system"),
          ccAttr(col("code"), "code").as("code"),
          ccAttr(col("code"), "display").as("code_display"),
          ccAttr(col("clinicalStatus"), "code").as("clinical_status"),
          ccAttr(col("verificationStatus"), "code").as("verification_status"),
          col("onsetDateTime").as("onset_datetime"),
          col("recordedDate").as("recorded_datetime")),
      "condition_id")

  /** OBSERVATION (reference :140-184) — value[x] choice handling: numeric →
    * value_quantity (double), every other variant coalesced into
    * value_string exactly in the reference's priority order (:165-176).
    */
  def observations(flat: DataFrame): DataFrame =
    dedupOn(
      flat.filter(col("resourceType") === "Observation")
        .select(
          col("id").as("observation_id"),
          refToUuid(col("subject.reference")).as("patient_id"),
          refToUuid(col("encounter.reference")).as("encounter_id"),
          col("status"),
          ccAttr(col("category").getItem(0), "display").as("category"),
          ccAttr(col("code"), "system").as("code_system"),
          ccAttr(col("code"), "code").as("code"),
          ccAttr(col("code"), "display").as("code_display"),
          col("valueQuantity.value").as("value_quantity"),
          col("valueQuantity.unit").as("value_unit"),
          coalesce(
            col("valueString"),
            ccAttr(col("valueCodeableConcept"), "display"),
            ccText(col("valueCodeableConcept")),
            col("valueInteger").cast("string"),
            col("valueBoolean").cast("string"),
            col("valueDateTime"),
            col("valueTime"),
            col("valuePeriod.start"),
            col("valueRange.low.value").cast("string"),
            col("valueSampledData.data")).as("value_string"),
          col("effectiveDateTime").as("effective_datetime")),
      "observation_id")

  /** Full L1 pipeline: path → (patient, encounter, condition, observation).
    *
    * The flattened entry frame feeds four separately-actioned outputs; a
    * cache here (pre-r7) leaked block-manager storage into the caller's
    * session forever. Instead ONE resourceType-keyed shuffle is frozen as
    * an RDD scan (the shared-shuffle pattern of `scale.Dedup`): the first
    * action pays the JSON parse + shuffle write, the other three skip the
    * map stage and re-read the shuffle files, and nothing stays
    * registered (shuffle files are GC'd with the lineage). The key also
    * aligns each extractor's resourceType filter with whole partitions.
    */
  def curate(spark: SparkSession, path: String):
      (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val flat = org.apache.spark.sql.graftbridge.Bridge.freezeLineage(
      entries(readBundles(spark, path)).repartition(col("resourceType")))
    (patients(flat), encounters(flat), conditions(flat), observations(flat))
  }

  /** Parquet sink — append + optional partitioning (reference :187-197). */
  def writeParquet(df: DataFrame, path: String, partitions: Seq[String] = Nil): Unit = {
    val w = df.write.mode("append")
    (if (partitions.nonEmpty) w.partitionBy(partitions: _*) else w).parquet(path)
  }
}
