package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with the same
  * key whose timestamp is <= the left timestamp (the canonical point-in-time
  * lookup for feature engineering / slowly-changing state).
  *
  * Implementation is the union-tag-window pattern, NOT a range cross join:
  * tag both inputs, union on (key, ts), and carry the last right payload
  * forward with last_value(ignoreNulls) over an ordered per-key window.
  * Cost: ONE shuffle on the key (the window exchange) over |L|+|R| rows —
  * no pair explosion, no broadcast requirement, skew handled by AQE like
  * any window. This is the plan shape that survives 100 TB; a
  * BroadcastNestedLoopJoin range join would not.
  */
object AsOfJoin {

  /** @param left      probe side (keeps every row)
    * @param right     state side (its latest-at-or-before row is attached)
    * @param key       equi-join key column name (both sides)
    * @param leftTs    left ordering column (must be mutually comparable
    *                  with rightTs, e.g. both timestamps)
    * @param rightTs   right ordering column
    * @param rightCols right payload columns to attach (null when no right
    *                  row precedes the left row)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumn("__payload", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightCols.map(col): _*).schema.fields)))
    val r = right.select(
      col(key), col(rightTs).as("__ts"),
      struct(rightCols.map(col): _*).as("__payload"))
      .withColumn("__side", lit(0))
    // union with aligned schemas: left keeps all its columns; right carries
    // only (key, ts, payload)
    val lCols = left.columns
    val rAligned = lCols.foldLeft(r) { (acc, c) =>
      if (acc.columns.contains(c)) acc
      else acc.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((lCols.toIndexedSeq.map(col) :+ col("__side") :+ col("__ts") :+ col("__payload")): _*)
    val lAligned = l.select((lCols.toIndexedSeq.map(col) :+ col("__side") :+ col("__ts") :+ col("__payload")): _*)
    // order right rows BEFORE left rows at equal ts (asof is <=)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = rAligned.union(lAligned)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    rightCols.foldLeft(joined)((acc, c) =>
      acc.withColumn(c, col(s"__asof.$c")))
      .drop("__side", "__ts", "__payload", "__asof")
  }
}
