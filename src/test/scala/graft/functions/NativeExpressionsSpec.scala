package graft.functions

import graft.SparkSpec
import graft.core.{Tables => T}
import graft.scale.{Dedup, Similarity, TextOps}
import org.apache.spark.sql.functions._

/** The native codegen expressions must be bit-identical to their
  * expression-combinator reference formulations — verified over real data.
  */
class NativeExpressionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("native minhash == HOF minhash on the documents table") {
    val docs = T.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("th", transform(col("toks"), t => xxhash64(t)))
      .withColumn("sh", Dedup.hashedShingles(col("th"), 3))
      .withColumn("xs", transform(col("sh"), x => pmod(x, lit(2147483647L))))
    val both = docs
      .withColumn("hof", Dedup.minhashSignature(col("xs"), 64))
      .withColumn("native", NativeExpressions.minhash_signature(col("xs"), 64))
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
    assert(both.count() == 500)
  }

  test("native cosine == HOF cosine on the embeddings table (bit-exact)") {
    val emb = T.embeddings(spark, sf)
      .select(Similarity.toDouble(col("embedding")).as("v"))
    val pairs = emb.limit(30).withColumn("k", lit(1)).as("a")
      .join(emb.limit(30).withColumn("k", lit(1)).as("b"), "k")
    val both = pairs.select(
      Similarity.cosine(col("a.v"), col("b.v")).as("hof"),
      Similarity.cosineNative(col("a.v"), col("b.v")).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
  }

  test("native cosine accepts float arrays directly") {
    val emb = T.embeddings(spark, sf).limit(5)
    val got = emb.as("a").crossJoin(emb.as("b"))
      .select(NativeExpressions.cosine_similarity(
        col("a.embedding"), col("b.embedding")).as("sim"),
        (col("a.vec_id") === col("b.vec_id")).as("same"))
      .collect()
    got.foreach { r =>
      val sim = r.getDouble(0)
      assert(sim >= -1.0001 && sim <= 1.0001)
      if (r.getBoolean(1)) assert(math.abs(sim - 1.0) < 1e-6)
    }
  }

  test("codegen and interpreted paths agree") {
    // force interpreted eval by constructing rows and calling eval directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val xs = new GenericArrayData(Array(5L, 17L, 99999L))
    val expr = MinHashSignature(Literal.create(xs,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)), 8, 2147483647L)
    val interp = expr.eval(null).asInstanceOf[GenericArrayData].toLongArray()
    // same via a DataFrame (codegen path)
    import spark.implicits._
    val viaDf = Seq(Seq(5L, 17L, 99999L)).toDF("xs")
      .select(NativeExpressions.minhash_signature(col("xs"), 8).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(interp.toSeq == viaDf)
  }
}
