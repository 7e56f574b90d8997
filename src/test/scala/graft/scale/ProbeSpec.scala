package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProbeSpec extends SparkSpec {
  import spark.implicits._

  test("det: pinned Laplace expansion matches known determinants") {
    assert(Probe.det(Vector(Vector(3.0))) == 3.0)
    assert(Probe.det(Vector(Vector(1.0, 2.0), Vector(3.0, 4.0))) == -2.0)
    assert(Probe.det(Vector(
      Vector(2.0, 0.0, 0.0), Vector(0.0, 3.0, 0.0),
      Vector(0.0, 0.0, 4.0))) == 24.0)
    // permutation matrix: det = sign
    assert(Probe.det(Vector(
      Vector(0.0, 1.0, 0.0, 0.0), Vector(1.0, 0.0, 0.0, 0.0),
      Vector(0.0, 0.0, 1.0, 0.0), Vector(0.0, 0.0, 0.0, 1.0))) == -1.0)
  }

  test("ridge probe recovers an exactly-linear label at tiny lambda") {
    val rnd = new scala.util.Random(5L)
    val rows = (0 until 400).map { i =>
      val x0 = rnd.nextDouble() * 10 - 5
      val x1 = rnd.nextDouble() * 4
      val x2 = rnd.nextDouble() * 2 - 1
      (i.toLong, x0, x1, x2, 2.0 * x0 - 1.0 * x1 + 0.5 * x2 + 7.0)
    }.toDF("id", "x0", "x1", "x2", "y")
    val feats = Seq(col("x0"), col("x1"), col("x2"))
    val w = Probe.ridgeTrain(rows, feats, col("y"), lambda = 1e-9)
    val expect = Seq(2.0, -1.0, 0.5, 7.0)
    w.toSeq.zip(expect).foreach { case (got, e) =>
      assert(math.abs(got - e) < 1e-3, s"weights ${w.toSeq}")
    }
    // scoring with the trained weights reproduces the label to ~round-off
    val maxErr = rows
      .select(abs(Probe.scoreExpr(feats, w) - col("y")).as("e"))
      .agg(max("e")).collect().head.getDouble(0)
    assert(maxErr < 1e-2, s"max scoring error $maxErr")
  }

  test("ridge term shrinks weights toward zero") {
    val rows = (0 until 200).map { i =>
      val x = i / 100.0
      (i.toLong, x, 3.0 * x)
    }.toDF("id", "x0", "y")
    val w0 = Probe.ridgeTrain(rows, Seq(col("x0")), col("y"), lambda = 1e-9)
    val wBig = Probe.ridgeTrain(rows, Seq(col("x0")), col("y"), lambda = 100.0)
    assert(math.abs(w0(0) - 3.0) < 1e-3)
    assert(math.abs(wBig(0)) < math.abs(w0(0)))
  }

  test("contract guards: width cap, singularity, weight arity") {
    val rows = Seq((1L, 1.0, 2.0)).toDF("id", "x0", "y")
    intercept[IllegalArgumentException] {
      Probe.ridgeTrain(rows, Seq(col("x0"), col("x0"), col("x0"), col("x0")),
        col("y"), lambda = 0.1)
    }
    // duplicated feature at lambda = 0: singular normal equations
    val dup = (0 until 50).map(i => (i.toLong, i.toDouble, i.toDouble, 1.0))
      .toDF("id", "x0", "x1", "y")
    intercept[IllegalArgumentException] {
      Probe.ridgeTrain(dup, Seq(col("x0"), col("x1")), col("y"), lambda = 0.0)
    }
    intercept[IllegalArgumentException] {
      Probe.scoreExpr(Seq(col("x0")), Array(1.0, 2.0, 3.0))
    }
  }
}
