package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** (group, hash) rows through the real portable-hash kernel — an
    * affine toy hash of consecutive integers is a near-permutation whose
    * too-even bucket occupancy skews the linear-counting zero count.
    */
  private def hashRows(values: Seq[(String, Long)]): DataFrame =
    values.toDF("g", "v").select(col("g"),
      explode(Dedup.portableTokenHashes(
        array(concat(lit("tok"),
          (col("v") * 2654435761L).cast("string"))))).as("h"))

  private def regsOf(df: DataFrame): Map[String, Seq[Int]] =
    df.collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSeq).toMap

  test("hll: merge of split sketches == sketch of the union") {
    val all = (0L until 3000L).map(i => (s"s${i % 3}", i))
    val (a, b) = all.partition(_._2 % 2 == 0)
    val skA = Sketches.hllSketch(hashRows(a), "g", "h")
    val skB = Sketches.hllSketch(hashRows(b), "g", "h")
    val merged = regsOf(Sketches.hllMerge(skA, skB, "g"))
    val whole = regsOf(Sketches.hllSketch(hashRows(all), "g", "h"))
    assert(merged === whole)
    assert(merged.keySet === Set("s0", "s1", "s2"))
    assert(merged.values.forall(_.length == Sketches.HllM))
  }

  test("hll: merge is idempotent and keeps one-sided groups") {
    val a = (0L until 500L).map(i => ("only_a", i))
    val b = (0L until 400L).map(i => ("only_b", i * 7 + 1))
    val skA = Sketches.hllSketch(hashRows(a), "g", "h")
    val skB = Sketches.hllSketch(hashRows(b), "g", "h")
    val merged = Sketches.hllMerge(skA, skB, "g")
    assert(regsOf(merged).keySet === Set("only_a", "only_b"))
    // folding the same batch in again changes nothing
    assert(regsOf(Sketches.hllMerge(merged, skA, "g")) === regsOf(merged))
    // one-sided groups keep their registers verbatim
    assert(regsOf(merged)("only_a") === regsOf(skA)("only_a"))
  }

  test("hll: corrected estimate lands within 3 standard errors of exact") {
    // standard error ≈ 1.04/√64 = 13%; distinct counts across regimes
    // (linear-counting range and harmonic range for m = 64)
    Seq(40L, 200L, 2000L, 20000L).foreach { n =>
      val rows = hashRows((0L until n).map(i => ("g", i)))
      val sk = Sketches.hllSketch(rows, "g", "h")
      val est = Sketches.hllCorrectedEstimate(sk, "g")
        .select(col("estimate")).collect().head.getDouble(0)
      assert(math.abs(est - n) / n.toDouble < 0.39,
        s"n=$n estimated $est")
    }
  }

  test("hll: duplicates are free - re-ingested values leave registers fixed") {
    val once = hashRows((0L until 1000L).map(i => ("g", i)))
    val thrice = hashRows((0L until 3000L).map(i => ("g", i % 1000)))
    assert(regsOf(Sketches.hllSketch(once, "g", "h")) ===
      regsOf(Sketches.hllSketch(thrice, "g", "h")))
  }
}
