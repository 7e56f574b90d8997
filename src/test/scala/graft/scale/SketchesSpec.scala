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

  // ------------------------------------------------------ histogram sketch

  import spark.implicits._

  private def histOf(df: DataFrame): Map[String, Seq[Long]] =
    df.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

  test("hist: counters == driver-side binning, incl. under/overflow cells") {
    // [0, 100) x 10 bins of width 10; values at every boundary + outliers
    val vals = Seq(-5L, 0L, 9L, 10L, 15L, 99L, 100L, 250L, 55L, 55L)
    val got = histOf(Sketches.histSketch(
      vals.map(("g", _)).toDF("g", "u"), "g", "u", 0L, 100L, 10))("g")
    val want = Array.fill(12)(0L)
    vals.foreach { u =>
      val slot = if (u < 0) 0 else if (u >= 100) 11 else (u / 10 + 1).toInt
      want(slot) += 1
    }
    assert(got == want.toSeq)
  }

  test("hist: merge of parity batches == whole build, counters bitwise") {
    val rnd = new scala.util.Random(159)
    val all = (0 until 5000).map(i => (s"g${i % 3}", rnd.nextInt(1200).toLong - 100L))
    val (a, b) = all.zipWithIndex.partition(_._2 % 2 == 0)
    val mk = (xs: Seq[(String, Long)]) =>
      Sketches.histSketch(xs.toDF("g", "u"), "g", "u", 0L, 1000L, 50)
    val merged = histOf(Sketches.histMerge(mk(a.map(_._1)), mk(b.map(_._1)), "g"))
    assert(merged == histOf(mk(all)))
    merged.foreach { case (g, cs) => assert(cs.sum == all.count(_._1 == g)) }
  }

  test("hist: quantile estimate within one bin width of the exact quantile") {
    val rnd = new scala.util.Random(42)
    val vals = (0 until 4000).map(_ => rnd.nextInt(1000).toLong)
    val sk = Sketches.histSketch(vals.map(("g", _)).toDF("g", "u"),
      "g", "u", 0L, 1000L, 50)
    val sorted = vals.sorted
    for ((num, den) <- Seq((1, 2), (9, 10), (99, 100), (1, 100))) {
      val est = sk.select(Sketches.histQuantileCol(col("counters"),
          num, den, 0L, 1000L, 50).as("q"))
        .collect().head.getLong(0)
      val rank = (vals.size.toLong * num + den - 1) / den
      val exact = sorted((rank - 1).toInt)
      assert(est <= exact && exact < est + 20,
        s"q=$num/$den est=$est exact=$exact")
    }
  }

  test("hist: out-of-range mass resolves to the lo/hi boundaries") {
    val vals = Seq.fill(10)(-50L) ++ Seq.fill(10)(5000L)
    val sk = Sketches.histSketch(vals.map(("g", _)).toDF("g", "u"),
      "g", "u", 0L, 1000L, 10)
    val got = sk.select(
        Sketches.histQuantileCol(col("counters"), 1, 4, 0L, 1000L, 10).as("lo"),
        Sketches.histQuantileCol(col("counters"), 3, 4, 0L, 1000L, 10).as("hi"))
      .collect().head
    assert(got.getLong(0) == 0L && got.getLong(1) == 1000L)
  }
}
