package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate: the buffer keeps the k smallest DISTINCT hash values seen —
  * bounded at ~8k bytes no matter how many rows flow through, mergeable
  * by set-union-and-truncate, so Spark runs it with map-side partial
  * aggregation like any built-in aggregate (the shuffle carries one
  * small sketch per group per mapper, never the values).
  *
  * Estimator (hashes uniform on [0, domain)): with fewer than k distinct
  * hashes the sketch IS the exact distinct count; otherwise the k-th
  * minimum h_k estimates density and distinct ≈ (k−1) · domain / h_k.
  * Relative error ~ 1/√(k−2) (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD 2007).
  *
  * Unlike HLL, KMV over a DETERMINISTIC hash is exactly reproducible on
  * any engine: feed it [[graft.scale.Sampling.portableBucket]] values and
  * the estimate — not just its error bound — hash-matches a DuckDB
  * mirror (q57), which is how a sketch gets a full correctness oracle.
  * The input column must already be hashed (pass xxhash64(...) or the
  * portable bucket); the sketch is agnostic to the hash as long as
  * `domain` matches its range.
  */
case class KMinValues(
    child: Expression, k: Int, domain: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"k must be >= 2, got $k")
  require(domain > 0, s"domain must be positive, got $domain")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only touch the tree if h can enter the k smallest
      if (buffer.size < k || h < buffer.last) {
        buffer.add(h)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buffer.size < k || h < buffer.last) {
        buffer.add(h)
        if (buffer.size > k) buffer.pollLast()
      }
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any =
    if (buffer.size < k) buffer.size.toDouble
    else (k - 1).toDouble * domain / buffer.last.toDouble

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}
