package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary as a native Catalyst aggregate: the
  * buffer holds at most `capacity` (token, count) counters no matter how
  * many tokens flow through, and merges like any built-in aggregate —
  * map-side partials, one small summary per partition on the shuffle,
  * never the token stream itself. This is the frequent-items half of the
  * scale path for "top-k tokens over a 100 TB corpus": the full
  * `groupBy(token).count()` must hold EVERY distinct token in the
  * aggregation hash maps (billions of keys → spill), while this summary
  * is ~`capacity` entries per partition by construction.
  *
  * Semantics (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *   - update: increment the token's counter if present; insert at 1 if
  *     a slot is free; otherwise decrement ALL counters by 1 and drop
  *     zeros (the incoming token is consumed by the same decrement).
  *     Amortized O(1): a decrement event destroys capacity+1 count
  *     units, so there are at most N/(capacity+1) events in total.
  *   - merge: sum counters pairwise; if more than `capacity` survive,
  *     subtract the (capacity+1)-th largest count from every counter and
  *     drop the non-positive ones (at most `capacity` stay).
  *
  * Error bound used by callers as an EXACTNESS CERTIFICATE: every
  * estimate is an undercount, and for any token x
  *
  *   true(x) − est(x)  ≤  D / (capacity + 1),   D = N − Σ counters
  *
  * (each decrement event that can cost x one unit of count destroys at
  * least capacity+1 units globally). In particular a token absent from
  * the final summary has true count ≤ D/(capacity+1) — so a second,
  * candidate-filtered exact pass can certify its top-k as globally
  * exact whenever the k-th exact count clears that threshold. See
  * [[graft.scale.TextOps.heavyHitters]].
  *
  * Output: array<struct<token string, est long>> ordered by (est desc,
  * token asc) — deterministic for a given input multiset.
  */
case class MisraGries(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  override def update(buffer: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      val cur = buffer.get(key)
      if (cur != null) buffer.put(key, cur + 1L)
      else if (buffer.size < capacity) buffer.put(key.clone(), 1L)
      else {
        // decrement-all event: the incoming token and one unit of every
        // counter annihilate (capacity+1 count units leave the summary)
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def merge(buffer: java.util.HashMap[UTF8String, java.lang.Long],
      other: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buffer.get(e.getKey)
      buffer.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buffer.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything:
      // ≤ capacity entries can stay strictly positive, and the summary
      // keeps the mergeable-summaries undercount bound.
      val counts = new Array[Long](buffer.size)
      var i = 0
      val cit = buffer.values().iterator()
      while (cit.hasNext) { counts(i) = cit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val eit = buffer.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= sub) eit.remove() else e.setValue(e.getValue - sub)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    val entries = new Array[(UTF8String, Long)](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortWith { case ((ta, ca), (tb, cb)) =>
      if (ca != cb) ca > cb else ta.compareTo(tb) < 0
    }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c))
    })
  }

  override def serialize(buffer: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buffer.entrySet().iterator()
    while (it0.hasNext) { bytes += 12 + it0.next().getKey.numBytes(); }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.size)
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes
      bb.putInt(kb.length)
      bb.put(kb)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val map = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      map.put(UTF8String.fromBytes(kb), bb.getLong)
      i += 1
    }
    map
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("est", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}
