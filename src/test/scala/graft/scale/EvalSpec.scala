package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the evaluation-metric family against brute-force driver
  * replays: AUC against the O(P·N) pairwise Mann-Whitney count, KS
  * against the literal ECDF-gap max — the definitions the collapsed
  * prefix-sum plans must reproduce exactly (integer numerators, one
  * division, so equality is bitwise).
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def bruteAuc(rows: Seq[(Long, Long)]): Option[Double] = {
    val pos = rows.collect { case (u, 1L) => u }
    val neg = rows.collect { case (u, 0L) => u }
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      Some(math.round(wins.toDouble / (2.0 * pos.length * neg.length)
        * 1e6) / 1e6)
    }
  }

  test("binaryAuc == brute-force pairwise Mann-Whitney, ties included") {
    val rnd = new scala.util.Random(171)
    val rows = (1 to 600).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val u = rnd.nextInt(20).toLong // few units -> many ties
      val y = if (rnd.nextInt(100) < 30 + 2 * u) 1L else 0L
      (g, u, y)
    }
    val got = Eval.binaryAuc(rows.toDF("g", "u", "y"),
        col("g"), col("u"), col("y"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      assert(got(g) == bruteAuc(rs.map(t => (t._2, t._3))), s"group $g")
    }
  }

  test("binaryAuc: perfect separation = 1.0, reversed = 0.0, all-ties = 0.5") {
    val df = Seq(
      ("sep", 10L, 1L), ("sep", 10L, 1L), ("sep", 1L, 0L),
      ("rev", 1L, 1L), ("rev", 10L, 0L),
      ("tie", 5L, 1L), ("tie", 5L, 0L), ("tie", 5L, 1L), ("tie", 5L, 0L),
      ("deg", 3L, 1L), ("deg", 4L, 1L)).toDF("g", "u", "y")
    val got = Eval.binaryAuc(df, col("g"), col("u"), col("y")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == Map("sep" -> Some(1.0), "rev" -> Some(0.0),
      "tie" -> Some(0.5), "deg" -> None))
  }

  test("ksStatistic == brute-force ECDF gap max") {
    val rnd = new scala.util.Random(172)
    val rows = (1 to 500).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val a = rnd.nextBoolean()
      // side A shifted upward in one group to force a visible D
      val u = (rnd.nextInt(30) + (if (a && g == "g0") 8 else 0)).toLong
      (g, u, a)
    }
    val got = Eval.ksStatistic(rows.toDF("g", "u", "a"),
        col("g"), col("u"), col("a"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val av = rs.filter(_._3).map(_._2)
      val bv = rs.filterNot(_._3).map(_._2)
      val units = rs.map(_._2).distinct.sorted
      val dNum = units.map(v => math.abs(
        bv.length.toLong * av.count(_ <= v) -
          av.length.toLong * bv.count(_ <= v))).max
      val d = math.round(dNum.toDouble / (av.length.toLong * bv.length)
        * 1e6) / 1e6
      assert(got(g) == ((av.length.toLong, bv.length.toLong, dNum, d)),
        s"group $g")
    }
  }

  test("rankingEval == driver-side MRR/recall/NDCG replay") {
    val rnd = new scala.util.Random(173)
    val k = 5
    val runs = (0 until 20).flatMap { q =>
      rnd.shuffle((0 until 50).toList).take(8).zipWithIndex
        .map { case (doc, i) => (q.toLong, doc.toLong, (i + 1).toLong) }
    }
    val gold = (0 until 20).flatMap { q =>
      rnd.shuffle((0 until 50).toList).take(rnd.nextInt(12) + 1)
        .map(doc => (q.toLong, doc.toLong, (rnd.nextInt(3) + 1).toLong))
    }
    val got = Eval.rankingEval(runs.toDF("q", "doc", "rank"),
        gold.toDF("q", "doc", "grade"), "q", "doc", "rank", "grade", k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    def rnd6(x: Double) = math.round(x * 1e6) / 1e6
    gold.groupBy(_._1).foreach { case (q, gs) =>
      val gmap = gs.map(t => t._2 -> t._3).toMap
      val top = runs.filter(t => t._1 == q && t._3 <= k).sortBy(_._3)
      val hitRanks = top.filter(t => gmap.contains(t._2)).map(_._3)
      val rr = if (hitRanks.isEmpty) 0.0 else 1.0 / hitRanks.min
      // fold in ascending rank order, exactly like the plan
      val dcg = top.foldLeft(0.0) { (a, t) =>
        a + gmap.getOrElse(t._2, 0L).toDouble /
          (math.log(t._3.toDouble + 1) / math.log(2.0))
      }
      val idcg = gs.map(t => (t._3, t._2)).sortBy(t => (-t._1, t._2))
        .take(k).zipWithIndex.foldLeft(0.0) { case (a, ((g, _), i)) =>
          a + g.toDouble / (math.log(i + 2.0) / math.log(2.0))
        }
      val want = (gs.length.toLong, hitRanks.length.toLong, rnd6(rr),
        rnd6(hitRanks.length.toDouble / gs.length), rnd6(dcg / idcg))
      assert(got(q) == want, s"query $q")
    }
    assert(got.keySet == gold.map(_._1).toSet)
  }

  test("cohenKappa == textbook contingency replay; degenerate group null") {
    val rnd = new scala.util.Random(174)
    val labels = Seq("x", "y", "z")
    val rows = (1 to 400).map { _ =>
      val g = s"g${rnd.nextInt(2)}"
      val a = labels(rnd.nextInt(3))
      // B mostly copies A
      val b = if (rnd.nextInt(10) < 7) a else labels(rnd.nextInt(3))
      (g, a, b)
    } ++ (1 to 5).map(_ => ("const", "x", "x")) // pe = 1 -> null kappa
    val got = Eval.cohenKappa(rows.toDF("g", "a", "b"),
        col("g"), col("a"), col("b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val n = rs.length.toLong
      val agree = rs.count(t => t._2 == t._3).toLong
      val pe = labels.map(l =>
        rs.count(_._2 == l).toLong * rs.count(_._3 == l).toLong).sum
      val kappa = if (n * n == pe) None
        else Some(math.round((n * agree - pe).toDouble / (n * n - pe)
          * 1e6) / 1e6)
      assert(got(g) == ((n, agree, pe, kappa)), s"group $g")
    }
  }

  test("chiSquareTerms == brute-force 2x2 chi2 on a tiny labeled corpus") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat"),
      (3L, "en", "cat and dog"),
      (4L, "fr", "le chat et le chien"),
      (5L, "fr", "le chien dort"),
      (6L, "fr", "chat dort the")).toDF("id", "lbl", "text")
    val got = Eval.chiSquareTerms(docs, col("lbl"), col("id"),
        col("text"), topK = 3, minDf = 2L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // driver replay
    val corpus = Seq(
      (1L, "en", Set("the", "cat", "sat", "on", "mat")),
      (2L, "en", Set("the", "dog", "sat")),
      (3L, "en", Set("cat", "and", "dog")),
      (4L, "fr", Set("le", "chat", "et", "chien")),
      (5L, "fr", Set("le", "chien", "dort")),
      (6L, "fr", Set("chat", "dort", "the")))
    val nDocs = corpus.length.toLong
    val terms = corpus.flatMap(_._3).distinct
      .filter(t => corpus.count(_._3(t)) >= 2)
    for (lbl <- Seq("en", "fr")) {
      val nl = corpus.count(_._2 == lbl).toLong
      // candidates = terms PRESENT in the label (the operator contract:
      // absent terms are pure anti-association, i.e. other labels' story)
      val want = terms.filter(t =>
        corpus.exists(c => c._2 == lbl && c._3(t))).map { t =>
        val a = corpus.count(c => c._2 == lbl && c._3(t)).toLong
        val tf = corpus.count(_._3(t)).toLong
        val det = (a * (nDocs - nl - tf + a) -
          (nl - a) * (tf - a)).toDouble
        val chi2 = (nDocs.toDouble * (det * det)) /
          ((nl.toDouble * (nDocs - nl).toDouble) *
            (tf.toDouble * (nDocs - tf).toDouble))
        (t, a, tf, chi2)
      }.sortBy(x => (-x._4, x._1)).take(3)
      want.zipWithIndex.foreach { case ((t, a, tf, chi2), i) =>
        val e = got((lbl, i + 1L))
        assert(e == ((t, a, tf, math.round(chi2 * 1e6) / 1e6)),
          s"label $lbl pos ${i + 1}")
      }
    }
  }

  test("jsDivergence == brute-force union-vocabulary JSD") {
    val rnd = new scala.util.Random(176)
    val vocab = (1 to 40).map(i => s"w$i")
    val docs = (1 to 120).map { _ =>
      val src = s"s${rnd.nextInt(3)}"
      // biased vocabularies per source so divergences differ
      val bias = src.last.asDigit * 10
      val words = (1 to rnd.nextInt(15) + 5)
        .map(_ => vocab(math.min(rnd.nextInt(30) + bias, 39)))
      (src, words.mkString(" "))
    }
    val got = Eval.jsDivergence(docs.toDF("src", "text"),
        col("src"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val bySrc = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, ws) => w -> ws.length.toLong }
    }
    def rnd6(x: Double) = math.round(x * 1e6) / 1e6
    val ln2 = math.log(2.0)
    for (sa <- bySrc.keys; sb <- bySrc.keys if sa < sb) {
      val (ca, cb) = (bySrc(sa), bySrc(sb))
      val (na, nb) = (ca.values.sum.toDouble, cb.values.sum.toDouble)
      val jsd = (ca.keySet ++ cb.keySet).toSeq.sorted.map { w =>
        val p = ca.getOrElse(w, 0L) / na
        val q = cb.getOrElse(w, 0L) / nb
        val m = (p + q) / 2
        (if (p > 0) p * math.log(p / m) else 0.0) / 2 +
          (if (q > 0) q * math.log(q / m) else 0.0) / 2
      }.sum
      val sharedTerms = ca.keySet.count(cb.keySet)
      val (gs, gj, gn) = got((sa, sb))
      assert(gs == sharedTerms.toLong, s"pair $sa-$sb shared")
      assert(math.abs(gj - jsd) < 2e-6, s"pair $sa-$sb jsd $gj vs $jsd")
      assert(math.abs(gn - jsd / ln2) < 2e-6, s"pair $sa-$sb norm")
    }
  }

  test("jsDivergence: identical corpora give 0, disjoint give ln 2") {
    val docs = Seq(("a", "x y z x"), ("b", "x y z x"), ("c", "u v w"))
      .toDF("src", "text")
    val got = Eval.jsDivergence(docs, col("src"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(("a", "b")) == ((3L, 0.0, 0.0)))
    assert(got(("a", "c"))._1 == 0L)
    assert(got(("a", "c"))._3 == 1.0) // normalized disjoint = exactly 1
  }

  test("prCurve == brute-force per-threshold confusion counts") {
    val rnd = new scala.util.Random(178)
    val rows = (1 to 300).map { _ =>
      val g = s"g${rnd.nextInt(2)}"
      val u = rnd.nextInt(15).toLong
      val y = if (rnd.nextInt(15) < u) 1L else 0L
      (g, u, y)
    }
    val got = Eval.prCurve(rows.toDF("g", "u", "y"),
        col("g"), col("u"), col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def rnd6(x: Double) = math.round(x * 1e6) / 1e6
    rows.groupBy(_._1).foreach { case (g, rs) =>
      rs.map(_._2).distinct.foreach { t =>
        val tp = rs.count(r => r._2 >= t && r._3 == 1L).toLong
        val fp = rs.count(r => r._2 >= t && r._3 == 0L).toLong
        val fn = rs.count(r => r._2 < t && r._3 == 1L).toLong
        assert(got((g, t)) == ((tp, fp, fn)), s"group $g threshold $t")
      }
      assert(got.keys.count(_._1 == g) == rs.map(_._2).distinct.length)
    }
  }

  test("calibrationError: integer telescoping == naive weighted-bin ECE") {
    val rnd = new scala.util.Random(179)
    val rows = (1 to 800).map { _ =>
      val g = s"g${rnd.nextInt(2)}"
      val u = rnd.nextInt(1000).toLong
      val y = if (rnd.nextInt(1000) < u) 1L else 0L
      (g, u, y)
    }
    val bins = 10
    val got = Eval.calibrationError(rows.toDF("g", "u", "y"),
        col("g"), col("u"), col("y"), bins)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val n = rs.length.toLong
      // naive definition: sum over bins of (n_b/N)|acc_b - conf_b|
      val naive = rs.groupBy(r => math.min(r._2 * bins / 1000, bins - 1L))
        .values.map { b =>
          val acc = b.count(_._3 == 1L).toDouble / b.length
          val conf = b.map(_._2).sum.toDouble / (1000.0 * b.length)
          b.length.toDouble / n * math.abs(acc - conf)
        }.sum
      val devNum = rs.groupBy(r => math.min(r._2 * bins / 1000, bins - 1L))
        .values.map(b => math.abs(1000L * b.count(_._3 == 1L) -
          b.map(_._2).sum)).sum
      val (gn, gd, ge) = got(g)
      assert(gn == n && gd == devNum, s"group $g counts")
      assert(math.abs(ge - naive) < 2e-6, s"group $g ece $ge vs $naive")
    }
  }

  test("mcnemar == discordant-pair replay; b=c=0 gives null statistic") {
    val rnd = new scala.util.Random(180)
    val rows = (1 to 400).map { _ =>
      val g = s"g${rnd.nextInt(2)}"
      val y = rnd.nextInt(2).toLong
      val pa = if (rnd.nextInt(10) < 7) y else 1L - y
      val pb = if (rnd.nextInt(10) < 8) y else 1L - y
      (g, y, pa, pb)
    } ++ Seq(("same", 1L, 1L, 1L), ("same", 0L, 1L, 1L)) // no discordants
    val got = Eval.mcnemar(rows.toDF("g", "y", "pa", "pb"),
        col("g"), col("y"), col("pa"), col("pb"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getLong(5),
          if (r.isNullAt(8)) None else Some(r.getDouble(8))))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val b = rs.count(r => r._3 == r._2 && r._4 != r._2).toLong
      val c = rs.count(r => r._3 != r._2 && r._4 == r._2).toLong
      val chi = if (b + c == 0) None
        else Some(math.round((math.abs(b - c) - 1.0) *
          (math.abs(b - c) - 1.0) / (b + c) * 1e6) / 1e6)
      assert(got(g) == ((b, c, chi)), s"group $g")
    }
  }

  test("fairnessAudit == per-group rate replay with exact DI ratio") {
    val rnd = new scala.util.Random(181)
    val rows = (1 to 500).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val y = rnd.nextInt(2).toLong
      // group-dependent selection bias so DI differs from 1
      val p = if (rnd.nextInt(10) < 3 + g.last.asDigit * 2) 1L else 0L
      (g, y, p)
    }
    val got = Eval.fairnessAudit(rows.toDF("g", "y", "p"),
        col("g"), col("y"), col("p"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(6))))
      .toMap
    def rnd6(x: Double) = math.round(x * 1e6) / 1e6
    val nAll = rows.length.toLong
    val selAll = rows.count(_._3 == 1L).toLong
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val n = rs.length.toLong
      val sel = rs.count(_._3 == 1L).toLong
      val di = rnd6((sel * nAll).toDouble / (n * selAll).toDouble)
      assert(got(g) == ((n, sel, rnd6(sel.toDouble / n), di)), s"group $g")
    }
  }

  test("ksStatistic: identical sides give D = 0; missing side gives null") {
    val same = Seq(("g", 1L, true), ("g", 1L, false),
      ("g", 7L, true), ("g", 7L, false)).toDF("g", "u", "a")
    val r0 = Eval.ksStatistic(same, col("g"), col("u"), col("a"))
      .collect().head
    assert(r0.getLong(3) == 0L && r0.getDouble(4) == 0.0)
    val one = Seq(("g", 1L, true), ("g", 2L, true)).toDF("g", "u", "a")
    val r1 = Eval.ksStatistic(one, col("g"), col("u"), col("a"))
      .collect().head
    assert(r1.getLong(2) == 0L && r1.isNullAt(4))
  }
}
