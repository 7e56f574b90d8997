package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-11 eval additions against literal driver replays:
  * the tie-aware fractional lift table (q187), integer-pico-unit
  * mutual-information term ranking (q188), the hashing-trick
  * vectorizer (q189), and held-out NB scoring with genuine OOV
  * tokens (q186). Rounding replays Spark's ROUND (BigDecimal
  * HALF_UP) exactly, including for negative cell terms.
  */
class EvalLiftSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def rU(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("liftTable == driver replay; bucket B recovers all positives") {
    val rnd = new scala.util.Random(187)
    val buckets = 10
    val rows = (1 to 700).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      val u = rnd.nextInt(25).toLong // few units -> heavy ties
      val y = if (rnd.nextInt(25) < u) 1L else 0L
      (g, u, y)
    }
    val got = Eval.liftTable(rows.toDF("g", "u", "y"),
        col("g"), col("u"), col("y"), buckets)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))))
      .toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val cont = rs.groupBy(_._2).map { case (u, xs) =>
        (u, xs.size.toLong, xs.count(_._3 == 1L).toLong)
      }.toSeq.sortBy(-_._1)
      val nn = cont.map(_._2).sum
      val np = cont.map(_._3).sum
      (1 to buckets).foreach { k =>
        var rowsAbove = 0L
        var posAbove = 0L
        var cum = Double.NaN
        cont.foreach { case (_, n, pos) =>
          if (cum.isNaN && rowsAbove * buckets < k * nn &&
              k * nn <= (rowsAbove + n) * buckets) {
            val mB = k * nn - rowsAbove * buckets
            cum = posAbove.toDouble +
              mB.toDouble * pos.toDouble / (buckets.toDouble * n.toDouble)
          }
          rowsAbove += n; posAbove += pos
        }
        assert(got((g, k.toLong)) == ((nn, np, r6(cum),
          r6(cum / np.toDouble),
          r6(cum * buckets.toDouble / (np.toDouble * k.toDouble)))),
          s"group $g bucket $k")
      }
      // the final cut takes everything: gain exactly 1, lift exactly 1
      assert(got((g, buckets.toLong))._3 == np.toDouble)
    }
  }

  test("mutualInfoTerms == driver replay with pico-unit cell sums") {
    val docs = Seq(
      (1L, "en", "the cat runs home"), (2L, "en", "the cat sat"),
      (3L, "en", "the dog runs"), (4L, "fr", "the chat dort"),
      (5L, "fr", "the chien court vite"), (6L, "fr", "the chat mange"),
      (7L, "de", "the katze schläft"), (8L, "de", "the hund rennt"))
    val topK = 5
    val minDf = 1L
    val got = Eval.mutualInfoTerms(docs.toDF("id", "lbl", "text"),
        col("lbl"), col("id"), col("text"), topK, minDf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // driver replay
    val pres = docs.flatMap { case (id, l, t) =>
      t.split("\\s+").filter(_.nonEmpty).distinct.map(term => (l, id, term))
    }.distinct
    val lt = pres.groupBy(p => (p._1, p._3)).map { case (k, v) =>
      k -> v.size.toLong
    }
    val tf = lt.groupBy(_._1._2).map { case (t, v) => t -> v.values.sum }
      .filter(_._2 >= minDf)
    val sizes = docs.groupBy(_._2).map { case (l, v) => l -> v.size.toLong }
    val n = docs.size.toLong
    def cellU(cnt: Long, rowm: Long, colm: Long): Long =
      if (cnt > 0)
        rU(1.0e12 * (cnt.toDouble / n.toDouble) *
          math.log(n.toDouble * cnt.toDouble /
            (rowm.toDouble * colm.toDouble)))
      else 0L
    val scored = lt.collect { case ((l, t), a) if tf.contains(t) =>
      val tfv = tf(t); val nl = sizes(l)
      val miU = cellU(a, tfv, nl) + cellU(nl - a, n - tfv, nl) +
        cellU(tfv - a, tfv, n - nl) +
        cellU(n - nl - tfv + a, n - tfv, n - nl)
      (l, t, a, tfv, miU)
    }.toSeq
    scored.groupBy(_._1).foreach { case (l, terms) =>
      terms.sortBy(x => (-x._5, x._2)).take(topK).zipWithIndex.foreach {
        case ((_, t, a, tfv, miU), i) =>
          assert(got((l, (i + 1).toLong)) ==
            ((t, a, tfv, r6(miU.toDouble / 1.0e12))), s"label $l pos ${i + 1}")
      }
    }
  }

  test("featureHash == driver replay over portableHash62") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "beta beta delta"),
      (3L, ""), (4L, "epsilon"))
    val dim = 64
    val got = TextOps.featureHash(docs.toDF("id", "text"),
        col("id"), col("text"), dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val want = docs.flatMap { case (id, t) =>
      t.split("\\s+").filter(_.nonEmpty).map { tok =>
        val h = graft.functions.NativeExpressions.portableHash62(
          UTF8String.fromString(tok))
        (id, h % dim, 1L - 2L * ((h >> 31) & 1L))
      }
    }.groupBy(x => (x._1, x._2))
      .map { case (k, v) => k -> v.map(_._3).sum }
      .filter(_._2 != 0L)
    assert(got == want)
    assert(!got.keySet.exists(_._1 == 3L)) // empty doc: no entries
  }

  test("psiVsGlobal == driver replay; pooled-identical group scores ~0") {
    val rnd = new scala.util.Random(190)
    val rows = (1 to 900).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      // g2 skews high so its PSI vs the pool is visibly > 0
      val u = if (g == "g2") 500L + rnd.nextInt(500) else rnd.nextInt(1000)
      (g, u.toLong)
    }
    val bins = 10
    val got = Eval.psiVsGlobal(rows.toDF("g", "u"), col("g"), col("u"),
        bins)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val act = rows.groupBy(r => (r._1, math.min(math.max(
      math.floor(r._2.toDouble / 1000d * bins).toLong, 0L), bins - 1L)))
      .map { case (k, v) => k -> v.size.toLong }
    val glob = act.groupBy(_._1._2).map { case (b, v) => b -> v.values.sum }
    val ta = act.groupBy(_._1._1).map { case (g, v) => g -> v.values.sum }
    val te = glob.values.sum
    ta.foreach { case (g, t) =>
      val psiU = glob.toSeq.map { case (b, e) =>
        val a0 = act.getOrElse((g, b), 0L)
        val ar = (a0 + 1).toDouble / (t + bins).toDouble
        val er = (e + 1).toDouble / (te + bins).toDouble
        rU(1.0e12 * ((ar - er) * math.log(ar / er)))
      }.sum
      assert(got(g) == ((t, r6(psiU.toDouble / 1.0e12))), s"group $g")
    }
    assert(got("g2")._2 > got("g0")._2, "skewed group must drift more")
  }

  test("cuped == driver replay; exact-linear pre-metric gives rho2 = 1") {
    val rnd = new scala.util.Random(191)
    val rows = (1 to 500).map { _ =>
      val g = s"g${rnd.nextInt(2)}"
      val x = rnd.nextInt(1000).toLong
      val y = x + rnd.nextInt(100).toLong
      (g, x, y)
    } :+ (("lin", 1L, 2L)) :+ (("lin", 2L, 4L)) :+ (("lin", 3L, 6L))
    val got = Eval.cuped(rows.toDF("g", "x", "y"), col("g"), col("x"),
        col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val n = rs.size.toLong
      val sx = rs.map(_._2).sum; val sy = rs.map(_._3).sum
      val sxy = rs.map(r => r._2 * r._3).sum
      val sxx = rs.map(r => r._2 * r._2).sum
      val syy = rs.map(r => r._3 * r._3).sum
      val cnum = n * sxy - sx * sy
      val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      val rho2 = cnum.toDouble * cnum.toDouble / (vx.toDouble * vy.toDouble)
      val varY = vy.toDouble / (n.toDouble * n.toDouble)
      assert(got(g) == ((n, r6(cnum.toDouble / vx.toDouble), r6(rho2),
        r6(sy.toDouble / n.toDouble), r6(varY),
        r6(varY * (1.0 - rho2)))), s"group $g")
    }
    assert(got("lin")._3 == 1.0 && got("lin")._6 == 0.0)
  }

  test("cuped: moment-product overflow raises instead of wrapping") {
    // 30 rows of x ≈ 5e8: every per-row product (2.5e17) and sum
    // (Σx² ≈ 7.5e18) still fits int64, but n·Σx² ≈ 2.2e20 wraps under
    // non-ANSI arithmetic; the guard must fail loudly, not report
    // corrupt theta/rho2
    val rows = (0 until 30).map(i =>
      ("g", 500_000_000L + i, 500_000_000L + 2L * i))
    val ex = intercept[Exception] {
      Eval.cuped(rows.toDF("g", "x", "y"), col("g"), col("x"), col("y"))
        .collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("int64 overflow"))))
  }

  test("referentialAudit: orphans, null FKs and coverage direction") {
    val child = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "zz"),
      (5L, null.asInstanceOf[String])).toDF("id", "fk")
    val parent = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("pk", "x")
    val row = Quality.referentialAudit("child->parent", child, col("fk"),
      parent, col("pk")).collect().head
    assert(row.getString(0) == "child->parent")
    assert(row.getLong(1) == 5L) // n_child counts nulls
    assert(row.getLong(2) == 1L) // the null FK is its own category
    assert(row.getLong(3) == 1L) // only "zz" is an orphan
    assert(row.getDouble(4) == 0.25) // 1 orphan / 4 resolvable (non-null) FKs
    // coverage direction: parents never referenced
    val cov = Quality.referentialAudit("parent->child", parent, col("pk"),
      child, col("fk")).collect().head
    assert(cov.getLong(3) == 1L) // "c" never appears in child
    // empty child and all-null-FK child → null rate, never NaN
    val empty = Quality.referentialAudit("none", child.where(col("id") < 0L),
      col("fk"), parent, col("pk")).collect().head
    assert(empty.getLong(1) == 0L && empty.isNullAt(4))
    val allNull = Quality.referentialAudit("nulls",
      child.where(col("fk").isNull), col("fk"), parent, col("pk"))
      .collect().head
    assert(allNull.getLong(1) == 1L && allNull.isNullAt(4))
  }

  test("conformalThreshold: exact order statistic, coverage >= k/n") {
    val rnd = new scala.util.Random(193)
    val rows = (1 to 800).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(200).toLong))
    val got = Eval.conformalThreshold(rows.toDF("g", "u"), col("g"),
        col("u"), alphaPct = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val n = rs.size.toLong
      val k = ((n + 1) * 90 + 99) / 100
      val thr = rs.map(_._2).sorted.apply((k - 1).toInt)
      val covered = rs.count(_._2 <= thr).toLong
      assert(got(g) == ((n, k, thr, covered)), s"group $g")
      assert(covered >= k, "conformal coverage bound")
    }
    // too few calibration rows for 90%: k = ceil(6*0.9) = 6 > n = 5
    val tiny = Eval.conformalThreshold(
      (1L to 5L).map(u => ("t", u)).toDF("g", "u"), col("g"), col("u"),
      alphaPct = 10).collect().head
    assert(tiny.getLong(1) == 5L && tiny.getLong(2) == 6L &&
      tiny.isNullAt(3) && tiny.isNullAt(5))
  }

  test("abTest == driver replay of z and Wilson; null guards hold") {
    val rnd = new scala.util.Random(194)
    val rows = (1 to 600).map { i =>
      val g = s"g${rnd.nextInt(2)}"
      val t = (i % 2).toLong
      val y = if (rnd.nextInt(100) < (if (t == 1L) 60 else 40)) 1L else 0L
      (g, t, y)
    } :+ (("onearm", 1L, 1L)) // no control rows -> z and p0 null
    val got = Eval.abTest(rows.toDF("g", "t", "y"), col("g"), col("t"),
        col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val n1 = rs.count(_._2 == 1L).toLong
      val x1 = rs.count(r => r._2 == 1L && r._3 == 1L).toLong
      val n0 = rs.count(_._2 == 0L).toLong
      val x0 = rs.count(r => r._2 == 0L && r._3 == 1L).toLong
      val r = got(g)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((n1, x1, n0, x0)), s"counts $g")
      if (n1 > 0 && n0 > 0) {
        val p1 = x1.toDouble / n1.toDouble
        val p0 = x0.toDouble / n0.toDouble
        val pp = (x1 + x0).toDouble / (n1 + n0).toDouble
        val z = (p1 - p0) / math.sqrt(pp * (1.0 - pp) *
          (1.0 / n1.toDouble + 1.0 / n0.toDouble))
        val denom = 1.0 + 3.8416 / n1.toDouble
        val center = (p1 + 3.8416 / (2.0 * n1.toDouble)) / denom
        val half = 1.96 * math.sqrt(p1 * (1.0 - p1) / n1.toDouble +
          3.8416 / (4.0 * n1.toDouble * n1.toDouble)) / denom
        assert(r.getDouble(8) == r6(z), s"z $g")
        assert(r.getDouble(9) == r6(center - half), s"wilson_lo $g")
        assert(r.getDouble(10) == r6(center + half), s"wilson_hi $g")
        // Wilson interval must contain the point estimate
        assert(r.getDouble(9) <= r.getDouble(5) &&
          r.getDouble(5) <= r.getDouble(10))
      }
    }
    val one = got("onearm")
    assert(one.isNullAt(6) && one.isNullAt(7) && one.isNullAt(8))
    assert(!one.isNullAt(9) && !one.isNullAt(10))
  }

  test("lshRecallEval: exact-basis precision 1; low bands lose recall") {
    // near-dup template corpus: pairs (2k, 2k+1) are true duplicates
    val docs = (0L until 40L).map { i =>
      val fam = i / 2
      val tail = if (i % 2 == 0) "alpha" else "alpha" // identical pair text
      (i, s"family $fam shared prefix tokens run $fam $tail end block $fam")
    }.toDF("id", "text")
    val full = Dedup.lshRecallEval(docs, "id", "text", shingleSize = 2,
      numPerm = 64, bands = 16, threshold = 0.8).collect().head
    assert(full.getLong(1) > 0L, "fixture must contain true pairs")
    assert(full.getDouble(5) == 1.0, "16 bands must recover every pair")
    assert(full.getDouble(4) == 1.0, "exact verify keeps precision 1")
    // 1 band of 64 rows: collision needs ALL 64 minhashes equal -> only
    // verbatim-identical shingle sets collide; recall stays defined and
    // correct, and can only be <= the 16-band recall
    val low = Dedup.lshRecallEval(docs, "id", "text", shingleSize = 2,
      numPerm = 64, bands = 1, threshold = 0.8).collect().head
    assert(low.getLong(1) == full.getLong(1), "ground truth is banding-free")
    assert(low.getLong(3) <= full.getLong(3))
    assert(low.isNullAt(4) || low.getDouble(4) == 1.0)
  }

  test("bootstrapMeanCI == full driver replay of every draw") {
    val rnd = new scala.util.Random(196)
    val rows = (1 to 300).map(_ => (s"g${rnd.nextInt(2)}",
      rnd.nextInt(1000).toLong))
    val m = 40
    val got = Eval.bootstrapMeanCI(rows.toDF("g", "u"), col("g"),
        col("u"), m, alphaPct = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val P = 2147483647L
    def bucket(k: Long): Long =
      math.floorMod(1103515245L * math.floorMod(k, P) + 12345L, P)
    val kLo = (m.toLong * 5 + 199) / 200 // = 1 for m = 40
    val kHi = m.toLong + 1 - kLo
    val groups = rows.map(_._1).distinct.sorted
    groups.zipWithIndex.foreach { case (g, gi) =>
      val gid = gi + 1L
      val vals = rows.filter(_._1 == g).map(_._2).sorted
      val n = vals.size.toLong
      val sums = (0L until m.toLong).map { r =>
        (0L until n).map { i =>
          vals(bucket(gid * 1000003L + r * 2654435761L + i).%(n).toInt)
        }.sum -> r
      }.sortBy(x => (x._1, x._2)).map(_._1)
      val want = ((n, m.toLong,
        r6(vals.sum.toDouble / n.toDouble),
        r6(sums(kLo.toInt - 1).toDouble / n.toDouble),
        r6(sums(kHi.toInt - 1).toDouble / n.toDouble)))
      assert(got(g) == want, s"group $g")
      // CI sanity: lo <= mean-ish ordering and lo <= hi always
      assert(got(g)._4 <= got(g)._5)
    }
  }

  test("unigramLmStats: Viterbi picks the cheaper segmentation exactly") {
    // corpus: "ababab" dominates, so pieces "ab"/"aba"/"bab" are cheap;
    // "xy" keeps rare chars in the inventory
    val docs = Seq((1L, "en", "ababab ababab ababab xy"),
      (2L, "en", "ababab ababab"), (3L, "de", "xy xy ababab"))
      .toDF("id", "lbl", "text")
    val got = TextOps.unigramLmStats(docs.toDF(), col("lbl"), col("text"),
        topBigrams = 5, topTrigrams = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    // driver replay of the full model
    val words = Seq("en" -> "ababab", "en" -> "ababab", "en" -> "ababab",
      "en" -> "xy", "en" -> "ababab", "en" -> "ababab",
      "de" -> "xy", "de" -> "xy", "de" -> "ababab")
    val wc = words.map(_._2).groupBy(identity).map { case (w, v) =>
      w -> v.size.toLong
    }
    def grams(k: Int) = wc.toSeq.flatMap { case (w, n) =>
      if (w.length >= k) (0 to w.length - k).map(i =>
        w.substring(i, i + k) -> n)
      else Nil
    }.groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }
    val g1 = grams(1); val nt = g1.values.sum
    def top(m: Map[String, Long], k: Int) =
      m.toSeq.sortBy(x => (-x._2, x._1)).take(k).toMap
    val vocab = (g1 ++ top(grams(2), 5) ++ top(grams(3), 5)).map {
      case (p, c) => p -> (math.round(1e6 * math.log(nt.toDouble)) -
        math.round(1e6 * math.log(c.toDouble)))
    }
    val BIG = 1000000000000000L
    def viterbi(w: String): Long = {
      val best = Array.fill(w.length + 1)(BIG)
      best(0) = 0L
      for (j <- 1 to w.length; k <- 1 to 3 if j >= k) {
        vocab.get(w.substring(j - k, j)).foreach { c =>
          if (best(j - k) != BIG && best(j - k) + c < best(j))
            best(j) = best(j - k) + c
        }
      }
      best(w.length)
    }
    words.groupBy(_._1).foreach { case (l, ws) =>
      val perW = ws.map(_._2).groupBy(identity).map { case (w, v) =>
        (w, v.size.toLong)
      }
      val nWords = perW.size.toLong
      val nTok = perW.values.sum
      val nCh = perW.map { case (w, n) => n * w.length }.sum
      val cu = perW.map { case (w, n) => n * viterbi(w) }.sum
      assert(got(l) == ((nWords, nTok, nCh, cu,
        r6(cu.toDouble / (1000000.0 * nCh.toDouble)))), s"lang $l")
    }
    // the multi-char pieces must actually win: cost("ababab") strictly
    // below six single-char picks
    val six = "ababab".map(c => vocab(c.toString)).sum
    assert(viterbi("ababab") < six, "subword pieces must beat chars")
  }

  test("unigramEncodeWords: pieces rebuild the word; longest-first ties") {
    val docs = Seq((1L, "ababab ababab ababab xy"),
      (2L, "ababab ababab"), (3L, "xy xy ababab"))
      .toDF("id", "text")
    val got = TextOps.unigramEncodeWords(docs, col("text"),
        topBigrams = 5, topTrigrams = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == Set("ababab", "xy"))
    // driver replay: same vocab + viterbi + longest-first backtrack
    val wc = Map("ababab" -> 6L, "xy" -> 3L)
    def grams(k: Int) = wc.toSeq.flatMap { case (w, n) =>
      if (w.length >= k) (0 to w.length - k).map(i =>
        w.substring(i, i + k) -> n) else Nil
    }.groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }
    val g1 = grams(1); val nt = g1.values.sum
    def top(m: Map[String, Long], k: Int) =
      m.toSeq.sortBy(x => (-x._2, x._1)).take(k).toMap
    val vocab = (g1 ++ top(grams(2), 5) ++ top(grams(3), 5)).map {
      case (p, c) => p -> (math.round(1e6 * math.log(nt.toDouble)) -
        math.round(1e6 * math.log(c.toDouble)))
    }
    val BIG = 1000000000000000L
    def encode(w: String): (Seq[String], Long) = {
      val best = Array.fill(w.length + 1)(BIG); best(0) = 0L
      for (j <- 1 to w.length; k <- 1 to 3 if j >= k)
        vocab.get(w.substring(j - k, j)).foreach { c =>
          if (best(j - k) != BIG && best(j - k) + c < best(j))
            best(j) = best(j - k) + c
        }
      var j = w.length
      var ps = List.empty[String]
      while (j > 0) {
        val k = (3 to 1 by -1).find { k =>
          j >= k && vocab.get(w.substring(j - k, j))
            .exists(c => best(j - k) + c == best(j))
        }.get
        ps = w.substring(j - k, j) :: ps
        j -= k
      }
      (ps, best(w.length))
    }
    wc.foreach { case (w, n) =>
      val (ps, cost) = encode(w)
      assert(got(w) == ((n, ps.mkString(" "), ps.size.toLong, cost)),
        s"word $w")
      assert(ps.mkString("") == w, "pieces must rebuild the word")
    }
    // the dominant word must compress below per-char encoding
    assert(got("ababab")._3 < 6L)
  }

  test("kCenterCoreset == driver greedy replay; radii never grow") {
    val rnd = new scala.util.Random(200)
    val emb = (0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
    val got = Similarity.kCenterCoreset(emb.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      if (math.sqrt(na) > 0 && math.sqrt(nb) > 0)
        d / (math.sqrt(na) * math.sqrt(nb)) else 0.0
    }
    val byId = emb.toMap
    var sel = List(0L) // seed = smallest id
    var want = List((1L, 0L, Option.empty[Double]))
    (2 to 6).foreach { t =>
      val cand = emb.filterNot(e => sel.contains(e._1)).map { case (id, v) =>
        id -> sel.map(s => 1.0 - cos(v, byId(s))).min
      }
      val (id, md) = cand.maxBy { case (id, md) => (md, -id) }
      sel = sel :+ id
      want = want :+ ((t.toLong, id, Some(r6(md))))
    }
    assert(got.toList == want)
    // farthest-point property: the coverage radius never grows
    val radii = got.flatMap(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a })
  }

  test("kCenterCoreset guards: k > N stops at N; bad inputs fail clearly") {
    val three = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)),
      (3L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    // k exceeding the point count returns the N-point coreset, no throw
    val capped = Similarity.kCenterCoreset(three, "vec_id", "embedding",
      k = 10).collect()
    assert(capped.length == 3)
    assert(capped.map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
    // empty input → clear require, not NoSuchElementException
    val exEmpty = intercept[IllegalArgumentException] {
      Similarity.kCenterCoreset(three.where(col("vec_id") < 0L),
        "vec_id", "embedding", k = 2)
    }
    assert(exEmpty.getMessage.contains("empty"))
    // non-numeric id (nulls under cast) → clear require, not NPE
    val badId = Seq(("doc-a", Seq(1f, 0f))).toDF("vec_id", "embedding")
    val exBad = intercept[IllegalArgumentException] {
      Similarity.kCenterCoreset(badId, "vec_id", "embedding", k = 1)
    }
    assert(exBad.getMessage.contains("non-null long"))
  }

  test("mmrRerank: near-duplicate runner-up loses to the diverse pick") {
    // q(1,0,0,0); c10 ~ q, c11 ≈ c10 (near-dup, slightly less relevant),
    // c12 orthogonal-ish but still relevant
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (10L, Seq(0.9f, 0.1f, 0f, 0f)),
      (11L, Seq(0.9f, 0.11f, 0f, 0f)),
      (12L, Seq(0.5f, 0f, 0.8f, 0f)))
    val df = emb.toDF("vec_id", "embedding")
    // diversity-heavy mix (λ = 0.3): pure relevance order is 10, 11,
    // 12, but the near-dup 11 must lose pos 2 to the diverse 12
    val got = Similarity.mmrRerank(df.where(col("vec_id") === 1L), df,
        "vec_id", "embedding", kCand = 3, kOut = 3,
        lambdaPermille = 300)
      .orderBy(col("pos"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 10L), (2L, 12L), (3L, 11L)))
    // at relevance-heavy λ = 0.7 the 0.99-relevant near-dup wins again
    val rel = Similarity.mmrRerank(df.where(col("vec_id") === 1L), df,
        "vec_id", "embedding", kCand = 3, kOut = 3,
        lambdaPermille = 700)
      .orderBy(col("pos"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rel.toSeq == Seq((1L, 10L), (2L, 11L), (3L, 12L)))
    // driver replay of the λ = 0.3 pos-2 decision
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = emb.head._2
    val byId = emb.toMap
    val sc11 = 0.3 * cos(q, byId(11L)) -
      (1.0 - 0.3) * cos(byId(11L), byId(10L))
    val sc12 = 0.3 * cos(q, byId(12L)) -
      (1.0 - 0.3) * cos(byId(12L), byId(10L))
    assert(sc12 > sc11, "fixture must make diversity decisive")
  }

  test("naiveBayesScore: held-out split with OOV-heavy and all-OOV docs") {
    val train = Seq(
      (2L, "en", "the cat runs the cat sat the dog barks"),
      (4L, "en", "the house is blue the dog runs"),
      (6L, "fr", "le chat dort le chien court le chat mange"),
      (8L, "fr", "la maison est bleue le chien dort"),
      (10L, "fr", "le taxi roule vite"))
    val score = Seq(
      (1L, "en", "the cat runs"), // in-vocab english
      (3L, "fr", "le chat court"), // in-vocab french
      (5L, "en", "zzz qqq xxx"), // all OOV -> prior argmax (fr: 3 > 2)
      (7L, "en", "the dog zzz qqq xxx yyy www")) // OOV-heavy but evidence en
    val got = Classify.naiveBayesScore(
        train.toDF("id", "lbl", "text"), score.toDF("id", "lbl", "text"),
        col("id"), col("lbl"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(3L) == "fr")
    // all-OOV: every class scores prior - ntok*base; fr has the larger
    // prior AND the larger vocab mass denominator — replay decides
    val U = 1000000L
    def lnU(x: Long): Long = math.round(U.toDouble * math.log(x.toDouble))
    val vocab = train.flatMap(_._3.split("\\s+")).distinct.size.toLong
    val byL = train.groupBy(_._2)
    val sc5 = byL.map { case (l, ds) =>
      val tl = ds.flatMap(_._3.split("\\s+").filter(_.nonEmpty)).size.toLong
      val prior = lnU(ds.size.toLong) - lnU(train.size.toLong)
      l -> (prior - 3L * lnU(tl + vocab))
    }
    val want5 = sc5.toSeq.sortBy { case (l, s) => (-s, l) }.head._1
    assert(got(5L) == want5)
    assert(got(7L) == "en") // "the dog" evidence survives 5 OOV tokens
    // confusion matrix totals match the scored frame
    val conf = Classify.naiveBayesHeldOutConfusion(
        train.toDF("id", "lbl", "text"), score.toDF("id", "lbl", "text"),
        col("id"), col("lbl"), col("text"))
      .collect().map(r => r.getLong(2)).sum
    assert(conf == score.size.toLong)
  }
}
