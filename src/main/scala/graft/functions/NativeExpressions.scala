package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Native Catalyst expressions (with whole-stage codegen) for the two hot
  * kernels of the scale layer, replacing interpreted higher-order-function
  * chains:
  *
  *  - [[MinHashSignature]]: one pass over the hashed-shingle array computes
  *    all `numPerm` minima (the HOF formulation re-traverses the array once
  *    per permutation and allocates an array per perm — 64× the passes);
  *  - [[CosineSimilarity]]: fused dot/norms in a single loop over two
  *    float/double arrays (the `aggregate`/`zip_with` formulation allocates
  *    three intermediate arrays per row).
  *
  * Both keep bit-exact parity with their expression-combinator twins
  * (same fold order), so oracle results are unchanged.
  */
object NativeExpressions {

  /** Deterministic affine hash family — shared by the HOF and native
    * implementations (must stay identical to Dedup.perms).
    */
  def minhashPerms(numPerm: Int, prime: Long): (Array[Long], Array[Long]) = {
    val as = new Array[Long](numPerm)
    val bs = new Array[Long](numPerm)
    var i = 0
    while (i < numPerm) {
      val a = 1L + 2654435761L * (i + 1) % (prime - 1)
      as(i) = a % (prime - 1) + 1
      bs(i) = 2246822519L * (i + 1) % prime
      i += 1
    }
    (as, bs)
  }

  def minhash_signature(hashedShingles: Column, numPerm: Int = 64,
      prime: Long = 2147483647L): Column =
    Bridge.column(MinHashSignature(
      Bridge.expression(hashedShingles), numPerm, prime))

  def cosine_similarity(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))

  def simhash64(tokenHashes: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokenHashes)))
}

/** minhash over pre-hashed shingles (values in [0, prime)): for each perm i,
  * min_x((a_i·x + b_i) mod prime). Null input → null; empty array → prime
  * (= "no shingle" sentinel, matching array_min of empty… which is null in
  * the HOF version — empty shingle arrays don't occur because
  * hashedShingles emits a 1-element array for short docs).
  */
case class MinHashSignature(child: Expression, numPerm: Int, prime: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  @transient private lazy val (pa, pb) =
    NativeExpressions.minhashPerms(numPerm, prime)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](numPerm)
    var i = 0
    while (i < numPerm) { out(i) = Long.MaxValue; i += 1 }
    var j = 0
    while (j < n) {
      val x = arr.getLong(j)
      var i2 = 0
      while (i2 < numPerm) {
        val h = (pa(i2) * x + pb(i2)) % prime
        if (h < out(i2)) out(i2) = h
        i2 += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val paRef = ctx.addReferenceObj("pa", pa, "long[]")
    val pbRef = ctx.addReferenceObj("pb", pb, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
        long[] $out = new long[$numPerm];
        java.util.Arrays.fill($out, Long.MAX_VALUE);
        for (int $j = 0; $j < $c.numElements(); $j++) {
          long $x = $c.getLong($j);
          for (int $i = 0; $i < $numPerm; $i++) {
            long $h = ($paRef[$i] * $x + $pbRef[$i]) % ${prime}L;
            if ($h < $out[$i]) $out[$i] = $h;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused cosine similarity over two numeric arrays (float or double
  * elements), computed in double with the same left-to-right accumulation
  * order as the aggregate/zip_with formulation. Either input null → null;
  * zero-norm → 0.0 (matching Similarity.cosine's guard).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val lf = isFloat(left); val rf = isFloat(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (math.sqrt(na) > 0 && math.sqrt(nb) > 0) dot / denom else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (isFloat(left)) "getFloat" else "getDouble"
    val getR = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $a.$getL($i);
          double $y = (double) $b.$getR($i);
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        ${ev.value} = (Math.sqrt($na) > 0 && Math.sqrt($nb) > 0)
          ? $dot / (Math.sqrt($na) * Math.sqrt($nb)) : 0.0;
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over pre-hashed tokens (array<long>): per-bit ±1 vote of
  * each token hash's bit, positive vote → bit set. Bit-identical to the HOF
  * reference `Dedup.simhash` (which votes with `shiftright(h, i) & 1` —
  * arithmetic vs logical shift is irrelevant under `& 1`), but hashes each
  * token ONCE and runs 64 bit-tests in a tight loop instead of re-evaluating
  * `xxhash64(token)` inside a 64-element `transform` lambda (64× the hashing,
  * plus a 64-long allocation per token, outside whole-stage codegen).
  * Ties (vote == 0, even token counts) leave the bit clear — same as the HOF.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
        int[] $votes = new int[64];
        for (int $j = 0; $j < $c.numElements(); $j++) {
          long $h = $c.getLong($j);
          for (int $i = 0; $i < 64; $i++) {
            if ((($h >>> $i) & 1L) == 1L) $votes[$i]++; else $votes[$i]--;
          }
        }
        long $out = 0L;
        for (int $i = 0; $i < 64; $i++) {
          if ($votes[$i] > 0) $out |= (1L << $i);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
