package graft.functions

import graft.SparkSpec

/** SQL-surface registration of the native expressions. */
class ExtensionsSpec extends SparkSpec {

  test("native functions callable from SQL after registration") {
    GraftExtensions.register(spark)

    val sim = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS s,
                cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS o""")
      .collect().head
    assert(math.abs(sim.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(sim.getDouble(1)) < 1e-12)

    val sig = spark.sql(
      "SELECT minhash_signature(array(5L, 17L, 99999L), 8) AS sig")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 8)
    // matches the expression evaluated directly
    val expected = MinHashSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array(5L, 17L, 99999L)),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), 8, 2147483647L)
      .eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray()
    assert(sig == expected.toSeq)
  }
}
