package graft.scale

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed data layout for co-located joins at 100 TB.
  *
  * A fact⋈fact join on a high-cardinality key (orders ⋈ lineitem,
  * events ⋈ features) shuffles BOTH sides every time it runs. When the same
  * join recurs — a daily pipeline joining the same tables, an ML feature
  * store keyed by entity id — the shuffle is pure rework. Writing both
  * sides bucketed by the join key (same bucket count, same hash) pays the
  * shuffle ONCE at write time; every subsequent sort-merge join reads
  * bucket i of each side into the same task with ZERO Exchange. At 1000
  * executors that removes the all-to-all network step entirely — the join
  * cost becomes two co-located scans plus a merge.
  *
  * Spark specifics this module encodes:
  *  - bucket metadata lives in the session catalog, so bucketed writes go
  *    through `saveAsTable` (plain `.save(path)` rejects `bucketBy`). With
  *    an explicit `path` option the table is EXTERNAL: data outlives the
  *    catalog entry and re-registering is cheap (`createBucketedTable`).
  *  - `sortBy(key)` inside each bucket file lets the sort-merge join skip
  *    its per-task sort when bucket files are read one-per-bucket
  *    (`spark.sql.sources.bucketing.enabled`, on by default).
  *  - bucket counts must match on both sides (or be multiples, with
  *    `spark.sql.bucketing.coalesceBucketsInJoin.enabled`); pick a count
  *    sized so one bucket of the BIG side fits an executor core's memory —
  *    at 100 TB that means thousands of buckets, and the bucket count IS
  *    the join parallelism, so round it to the cluster's core count.
  */
object Bucketing {

  /** Write `df` as an EXTERNAL bucketed table: hash-partitioned into
    * `numBuckets` by `key`, each bucket sorted by `sortCols` (default: the
    * key). Overwrites both catalog entry and files. The one-time shuffle
    * that this write pays (`repartition` on the key) is exactly the
    * shuffle every later join no longer needs; without it each task
    * would write every bucket (tasks × buckets small files).
    */
  def writeBucketed(df: DataFrame, table: String, path: String, key: String,
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    df.repartition(numBuckets, df(key))
      .write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Re-register an existing bucketed dataset written by [[writeBucketed]]
    * under a (possibly new) session catalog — the external-table analogue
    * of the reference's DDL-over-existing-S3-prefix pattern. The schema and
    * bucket spec must be restated because parquet files carry neither.
    */
  def createBucketedTable(spark: SparkSession, table: String, path: String,
      schemaDdl: String, key: String, numBuckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(
      s"""CREATE TABLE $table ($schemaDdl) USING parquet
          CLUSTERED BY ($key) SORTED BY ($key) INTO $numBuckets BUCKETS
          LOCATION '$path'""")
  }

  /** Equi-join two same-bucketed catalog tables. With matching bucket
    * counts and the join keys being the bucket keys, the physical plan is
    * a sort-merge join whose BOTH inputs are bucketed scans — no Exchange
    * on either side (asserted in LayoutSpec; Spark matches the
    * co-partitioning positionally, so the key COLUMNS may differ in name).
    * This function is trivially `spark.table ⋈ spark.table`; it exists to
    * name the pattern and carry the plan-shape contract.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
