package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registration for the native expressions, so SQL
  * users get them too:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     ...
  *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  *
  * (The Column-API entry points in [[NativeExpressions]] work without any
  * registration.)
  */
object GraftExtensions {
  /** Runtime registration into an EXISTING session (withExtensions only
    * applies at session build; getOrCreate on a live session ignores it).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1)),
      "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      (children: Seq[Expression]) => {
        val numPerm = children.lift(1) match {
          case Some(Literal(v, _)) => v.toString.toInt
          case _ => 64
        }
        MinHashSignature(children.head, numPerm, 2147483647L)
      },
      "built-in")
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        val numPerm = children.lift(1) match {
          case Some(Literal(v, _)) => v.toString.toInt
          case _ => 64
        }
        MinHashSignature(children.head, numPerm, 2147483647L)
      }))
  }
}
