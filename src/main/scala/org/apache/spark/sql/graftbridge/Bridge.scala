package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. Spark 4 made these conversions
  * `private[sql]`; an extension library providing native expressions needs
  * exactly these two hooks, so this object lives inside the sql package
  * namespace (the conventional pattern for Spark extension libraries).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan as a DataFrame (Dataset.ofRows is
    * `private[sql]` in Spark 4) — the entry point for whole-operator
    * extensions like [[graft.plans.TopKPerGroup]].
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Snap a DataFrame's lineage at its computed RDD so downstream
    * consumers REUSE its shuffle files instead of re-optimizing (and
    * re-running) the whole upstream plan per consumer — the stage-freeze
    * every multi-consumer composition here leans on (Dedup.sharedShuffle,
    * the q204 stage boundaries).
    *
    * The public route, `createDataFrame(df.rdd, df.schema)`, pays an
    * InternalRow→Row→InternalRow conversion per row per pass (external
    * Row allocation plus per-field encoder work on both sides);
    * `internalCreateDataFrame(queryExecution.toRdd, schema)` wraps the
    * UnsafeRow RDD directly. The `_.copy()` is load-bearing: shuffle
    * readers reuse row buffers, and LogicalRDD hands rows to consumers
    * that may buffer them (one flat byte-array copy — still far cheaper
    * than the external-Row round trip).
    */
  /** Test hook: a plan-shape spec that needs to witness structure INSIDE
    * a frozen subtree (freezes cut the visible plan at an RDD scan) sets
    * this thread-local buffer; every freezeLineage on the thread then
    * records the frozen frame's executed plan. Null (the default)
    * everywhere outside specs — one null check per freeze.
    */
  val recordFrozenPlans: ThreadLocal[
      scala.collection.mutable.Buffer[org.apache.spark.sql.execution.SparkPlan]] =
    new ThreadLocal

  def freezeLineage(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rec = recordFrozenPlans.get()
    if (rec != null) rec += df.queryExecution.executedPlan
    cs.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()), df.schema)
  }
}
