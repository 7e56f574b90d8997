package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance operators for a continuously-refreshed
  * corpus: upsert-merge (apply a change batch to a snapshot) and SCD2
  * interval building (turn a change log into validity ranges).
  *
  * A 100 TB training corpus is not rebuilt from scratch per release — it is
  * a base snapshot plus daily change batches (new crawls, takedown deletes,
  * re-scored documents). Both operators here are one-shuffle formulations:
  *
  *   - [[upsert]] shuffles base ∪ changes once on the merge key. On a real
  *     cluster the base snapshot is bucketed by that key
  *     ([[Bucketing.writeBucketed]]), so only the (small) change batch
  *     moves, and AQE handles the skewed-key case. No broadcast of the base
  *     side, no driver state — scales to any snapshot size.
  *   - [[scd2]] is a pure per-key window (lead over version): one shuffle,
  *     no join, no state. Keys are independent — linear scale-out.
  */
object Cdc {

  /** Merge a change batch into a base snapshot (the MERGE INTO / upsert of
    * a lakehouse pipeline, expressed engine-agnostically).
    *
    * Semantics: per key, the row with the highest `versionCol` wins; the
    * change batch beats the base on version ties (a re-delivered batch with
    * the same version must win deterministically). A winning change row
    * whose `opCol` equals `deleteOp` removes the key from the output
    * (tombstone). Base rows carry no op column.
    *
    * Change rows must have the base schema + `opCol`; extra/missing columns
    * are a caller bug surfaced by unionByName (no silent null-filling).
    *
    * Output: the merged snapshot with the base schema (op column dropped).
    */
  def upsert(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      versionCol: String, opCol: String = "op",
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    val tagged = base.withColumn(opCol, lit(null).cast("string"))
      .withColumn("__src", lit(0))
      .unionByName(changes.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 &&
        (col(opCol).isNull || col(opCol) =!= deleteOp))
      .drop("__rn", "__src", opCol)
  }

  /** Build SCD-type-2 validity intervals from a change log: one row per
    * (key, version) with `valid_from` = its version timestamp, `valid_to` =
    * the next version's timestamp (null while current), and `is_current`.
    * Exact duplicate (key, version) deliveries collapse to one row
    * (max-version dedup inside the same window pass would hide real
    * out-of-order bugs, so duplicates beyond the exact pair are kept and
    * surface as zero-length intervals for the caller to audit).
    *
    * One shuffle on the key; everything else is a per-key sorted pass.
    */
  def scd2(log: DataFrame, keyCols: Seq[String],
      versionCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val keyed = log.dropDuplicates(keyCols :+ versionCol)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    keyed
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Diff two snapshots of a keyed table into a change set: one row per key
    * that was inserted (`I`: in new only), deleted (`D`: in old only), or
    * updated (`U`: in both, any `compareCols` value differs). The inverse
    * of [[upsert]] — upserting the diff onto the old snapshot reproduces
    * the new one — and the standard way to BACKFILL a change feed between
    * two full exports when no CDC log exists (audits, vendor drops,
    * migration cutovers).
    *
    * Output: `keyCols` + `change_type` + `compareCols` (new-side values for
    * I/U, old-side values for D — the state a consumer must converge to).
    * Unchanged keys are dropped, so the result is delta-sized.
    *
    * One full-outer sort-merge join on the key — both snapshots shuffle
    * once. On a lakehouse deployment both exports are bucketed on the key
    * ([[Bucketing]]), making the join exchange-free; comparison is a
    * per-row struct equality (null-safe `<=>` per column), so the reduce
    * side streams. Callers should project `compareCols` down to the
    * audited columns — diffing a 100-column table on 3 business columns
    * must not shuffle the other 97.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    val o = oldSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__o", lit(1))
    val n = newSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__n", lit(1))
    val joined = o.as("o").join(n.as("n"), keyCols, "full_outer")
    val changed = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduce(_ || _)
    joined
      .withColumn("change_type",
        when(col("__o").isNull, lit("I"))
          .when(col("__n").isNull, lit("D"))
          .when(changed, lit("U")))
      .where(col("change_type").isNotNull)
      .select(keyCols.map(col) ++
        Seq(col("change_type")) ++
        compareCols.map(c =>
          when(col("change_type") === "D", col(s"o.$c"))
            .otherwise(col(s"n.$c")).as(c)): _*)
  }

  /** Incremental maintenance of an ADDITIVE aggregate (materialized-view
    * delta merge): `base` is the existing per-key aggregate state
    * (`cntCol` row count + `measureCols` sums), `delta` is a batch in the
    * SAME shape where inserts carry positive counts/measures and deletes
    * carry NEGATED ones (retraction records — the standard IVM encoding).
    * The merge is one keyed shuffle over base ∪ delta, never a rescan of
    * the fact history; a key whose merged count reaches 0 vanishes
    * (fully-retracted group). Additivity is the caller's contract: SUM
    * and COUNT qualify, MIN/MAX do not (a retraction can't un-take a
    * max — those need the full CDC upsert + recompute path).
    *
    * Exactness: measures should already be exact types (longs or
    * DECIMAL) — that is what makes the merge order-insensitive and the
    * maintained view bit-equal to a recompute, which q110 certifies.
    */
  def mergeAdditiveAggs(base: DataFrame, delta: DataFrame,
      keyCols: Seq[String], cntCol: String,
      measureCols: Seq[String]): DataFrame = {
    val merged = base.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(cntCol)).as(cntCol),
        measureCols.map(m => sum(col(m)).as(m)): _*)
    merged.where(col(cntCol) > 0)
  }

  /** Incremental maintenance of an equi-JOIN view under append-only
    * deltas — the join-side companion to [[mergeAdditiveAggs]] (q110
    * maintains aggregates; this maintains A ⋈ B itself):
    *
    *   Δ(A⋈B) = ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB
    *
    * (multiset-exact for inserts-only CDC — the append-only contract
    * every log/event source satisfies; retractions belong to the
    * upsert/SCD2 operators above). Returns ONLY the delta rows: the
    * caller appends them to the stored view, so steady state never
    * re-joins the two base tables — at 100 TB the whole point is that
    * both big-⋈-big terms have a DELTA side, which is batch-sized and
    * broadcastable, while base-⋈-base (the only big⋈big term) never
    * runs again after bootstrap.
    */
  def joinViewDelta(aBase: DataFrame, aDelta: DataFrame,
      bBase: DataFrame, bDelta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val k = keyCols
    aDelta.join(bBase, k)
      .unionByName(aBase.join(bDelta, k))
      .unionByName(aDelta.join(bDelta, k))
  }
}
