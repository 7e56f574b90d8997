package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.queries.Reports
import graft.wellness.Wellness

/** Property-based invariants (SURVEY.md §5.4), driven by raw ScalaCheck
  * generators under fixed seeds (the scalatest bridge isn't on the
  * classpath): latest-per-group equals argmax-by-timestamp under arbitrary
  * orderings; subscores stay in [0,100]; banding is total; jaccard is a
  * bounded symmetric similarity.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val obsGen = Gen.listOfN(40, for {
    pid <- Gen.oneOf("p1", "p2", "p3")
    key <- Gen.oneOf("A", "B")
    v <- Gen.choose(0.0, 300.0)
    t <- Gen.choose(0L, 1000L)
    id <- Gen.choose(0L, 1000000L)
  } yield (pid, key, v, t, id))

  test("latest-per-key == argmax by (ts, tiebreak) under any row order") {
    import spark.implicits._
    samples(obsGen, 8).foreach { rows =>
      val df = rows.toDF("pid", "key", "v", "t", "id")
      val got = Reports.latestPerKey(df, "pid", "key", "t", "id")
        .select("pid", "key", "v").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      val want = rows.groupBy(r => (r._1, r._2)).map { case (k, g) =>
        k -> g.maxBy(r => (r._4, r._5))._3
      }
      assert(got == want)
    }
  }

  test("disease subscores always in [0,100] or null; confidence in [0,1]") {
    import spark.implicits._
    val analytes = Wellness.Refs.keys.toSeq.sorted
    val rowGen = Gen.listOfN(analytes.size, Gen.option(Gen.choose(-50.0, 500.0)))
    samples(Gen.listOfN(20, rowGen), 5).foreach { rows =>
      val df0 = rows.indices.toDF("id")
      val withCols = analytes.zipWithIndex.foldLeft(df0) { case (acc, (a, j)) =>
        val vals = rows.map(_(j))
        acc.withColumn(a, element_at(typedLit(vals), col("id") + 1))
      }
      val scored = Wellness.scoreWide(withCols, identity).collect()
      scored.foreach { r =>
        Wellness.DiseaseWeights.keys.foreach { dis =>
          val i = r.fieldIndex(s"sub_${dis.toLowerCase}")
          if (!r.isNullAt(i)) {
            val s = r.getDouble(i)
            assert(s >= 0.0 && s <= 100.0, s"$dis -> $s")
          }
        }
        val ci = r.fieldIndex("confidence")
        assert(r.getDouble(ci) >= 0.0 && r.getDouble(ci) <= 1.0 + 1e-12)
        val wi = r.fieldIndex("wellness")
        if (!r.isNullAt(wi))
          assert(r.getDouble(wi) >= 0.0 && r.getDouble(wi) <= 100.0 + 1e-9)
      }
    }
  }

  test("CVD banding is total over doubles and null (never errors)") {
    import spark.implicits._
    val vals: Seq[Option[Double]] = Seq(Some(-1.0), Some(0.0), Some(39.999),
      Some(40.0), Some(59.0), Some(59.5), Some(60.0), Some(1e9), None)
    val df = vals.toDF("hdl")
    val got = df.select(Reports.banded(col("hdl"), "n/a", Reports.hdlBands)
      .as("b")).collect()
    assert(got.length == vals.length)
    assert(got.count(_.isNullAt(0)) == 1) // only 59.5 falls in the documented gap
  }

  test("connectedComponents (both paths) == union-find on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(15,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)).suchThat(p => p._1 != p._2))
    samples(edgeGen, 6).foreach { edges =>
      val norm = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val ids = (0L to 19L).toDF("id")
      // local (driver union-find) path — the default at this edge count
      val local = graft.scale.Dedup.connectedComponents(ids, norm.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // distributed label-propagation path, forced via localEdgeLimit = 0
      val dist = graft.scale.Dedup.connectedComponents(ids,
          norm.toDF("id_a", "id_b"), localEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find
      val parent = scala.collection.mutable.Map((0L to 19L).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      norm.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val want = (0L to 19L).map(i => i -> find(i)).toMap
      assert(local == want, s"local path, edges=$norm")
      assert(dist == want, s"distributed path, edges=$norm")
    }
  }

  test("lab-status banding is total and ordered over random doubles") {
    import spark.implicits._
    val refs = graft.wellness.LabInfo.all
    val valGen = Gen.option(Gen.choose(-100.0, 2000.0))
    samples(Gen.listOfN(30, Gen.zip(Gen.choose(0, refs.length - 1), valGen)), 5)
      .foreach { cases =>
        cases.foreach { case (ri, vOpt) =>
          val r = refs(ri)
          val df = Seq(vOpt).toDF("v")
          val status = df.select(graft.wellness.LabInfo
            .statusFromLabValue(col("v"), r.low, r.high).as("s"))
            .collect().head.getString(0)
          val want = vOpt match {
            case None => "Unknown"
            case Some(v) if v < r.low * 0.9 => "Low"
            case Some(v) if v < r.low => "Borderline low"
            case Some(v) if v <= r.high => "In range"
            case Some(v) if v <= r.high * 1.2 => "Borderline high"
            case _ => "High"
          }
          assert(status == want, s"${r.key} $vOpt")
        }
      }
  }

  test("Misra-Gries bound holds under arbitrary partition splits and merge trees") {
    import org.apache.spark.unsafe.types.UTF8String
    val m = 8
    val mg = graft.functions.MisraGries(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true), m)
    val tokGen = Gen.listOfN(400, Gen.frequency(
      (8, Gen.oneOf("a", "b", "c")),              // heavy hitters
      (3, Gen.choose(0, 50).map(i => s"t$i"))))   // long tail
    samples(Gen.zip(tokGen, Gen.choose(2, 6)), 12).foreach { case (toks, parts) =>
      // split the stream into `parts` partitions, build per-partition
      // buffers through update(), then merge left-to-right through a
      // serialize/deserialize round-trip (the shuffle path)
      val buffers = toks.grouped(math.max(1, toks.size / parts)).map { chunk =>
        chunk.foldLeft(mg.createAggregationBuffer()) { (buf, t) =>
          mg.update(buf, org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromString(t)))
        }
      }.toSeq
      val merged = buffers.reduce { (a, b) =>
        mg.merge(a, mg.deserialize(mg.serialize(b)))
      }
      assert(merged.size <= m)
      val truth = toks.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val est = {
        val it = merged.entrySet().iterator()
        val b = Map.newBuilder[String, Long]
        while (it.hasNext) { val e = it.next(); b += e.getKey.toString -> e.getValue.longValue() }
        b.result()
      }
      val deficit = toks.size.toLong - est.values.sum
      val bound = deficit / (m + 1L)
      est.foreach { case (t, e) =>
        assert(e <= truth(t), s"overestimate for $t")
        assert(truth(t) - e <= bound, s"$t under by ${truth(t) - e} > $bound")
      }
      truth.foreach { case (t, c) =>
        if (!est.contains(t))
          assert(c <= bound, s"absent $t true count $c exceeds bound $bound")
      }
    }
  }

  test("winnowing guarantee: two texts sharing a (k+w-1)-run share a selection, " +
    "and every selection's contexts are true substrings") {
    val k = 5; val w = 3; val t = k + w - 1
    def selections(s: String): Seq[(Long, String, String, String)] = {
      val arr = graft.functions.NativeExpressions.winnowContexts(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
      (0 until arr.numElements()).map { i =>
        val row = arr.getStruct(i, 4)
        (row.getLong(0), row.getUTF8String(1).toString,
          row.getUTF8String(2).toString, row.getUTF8String(3).toString)
      }
    }
    val alpha = Gen.listOfN(14, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val runGen = Gen.listOfN(t + 2, Gen.oneOf('x', 'y', 'z')).map(_.mkString)
    samples(Gen.zip(alpha, alpha, runGen), 25).foreach { case (p1, p2, run) =>
      val d1 = p1 + run + p2.reverse
      val d2 = p2 + run + p1.reverse
      val s1 = selections(d1)
      val s2 = selections(d2)
      // every selection is internally consistent: l+m+r is a substring
      // and m has exactly k code points
      s1.foreach { case (_, l, m, r) =>
        assert(m.length == k)
        assert(d1.contains(l + m + r))
      }
      // the shared >= t-run forces at least one common (hash, k-gram)
      // selection whose contexts extend to >= t on both sides
      val witness = for {
        a @ (h1, l1, m1, r1) <- s1
        b @ (h2, l2, m2, r2) <- s2
        if h1 == h2 && m1 == m2
        suff = (1 to math.min(l1.length, l2.length))
          .takeWhile(j => l1.takeRight(j) == l2.takeRight(j)).lastOption.getOrElse(0)
        pref = (1 to math.min(r1.length, r2.length))
          .takeWhile(j => r1.take(j) == r2.take(j)).lastOption.getOrElse(0)
        if suff + pref >= w - 1
      } yield (a, b)
      assert(witness.nonEmpty, s"no witness for shared run: d1=$d1 d2=$d2")
    }
  }

  test("prefix-filter jaccard == brute force on random corpora") {
    import spark.implicits._
    // small random vocabularies make adversarially dense bigram overlap;
    // maxBucket = 16 forces the hot-shingle ordering AND triangle splits
    // on most corpora — the full PPJoin path (length + positional
    // filters, packed-position hash aggregate, merge verify) against the
    // O(n²) ground truth at two thresholds.
    val corpusGen = for {
      vocab <- Gen.choose(8, 60)
      nDocs <- Gen.choose(20, 45)
      docs <- Gen.listOfN(nDocs, Gen.choose(5, 40).flatMap(len =>
        Gen.listOfN(len, Gen.choose(0, vocab - 1).map(w => s"w$w"))))
    } yield docs.map(_.mkString(" "))
    for ((texts, ci) <- samples(corpusGen, 3).zipWithIndex; t <- Seq(0.55, 0.75)) {
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val got = graft.scale.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 2, threshold = t, maxBucket = 16)
        .select("id_a", "id_b", "jaccard")
      val sh = docs.select($"doc_id",
        sort_array(array_distinct(graft.scale.Dedup.hashedShingles(
          graft.scale.Dedup.xxhashTokens(
            graft.scale.TextOps.tokens($"text")), 2))).as("sh"))
      val want = sh.as("a").crossJoin(sh.as("b"))
        .filter($"a.doc_id" < $"b.doc_id")
        .withColumn("jaccard", graft.scale.Dedup.jaccard($"a.sh", $"b.sh"))
        .filter($"jaccard" >= t)
        .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"),
          round($"jaccard", 6).as("jaccard"))
      assert(got.except(want).count() == 0 && want.except(got).count() == 0,
        s"corpus $ci threshold $t")
    }
  }

  test("snapshotDiff inverts upsert on random snapshot pairs") {
    import spark.implicits._
    val snapGen = Gen.listOfN(30, for {
      k <- Gen.choose(0L, 15L) // small key space → collisions → real I/D/U mix
      s <- Gen.oneOf("a", "b", "c")
      x <- Gen.choose(0.0, 10.0)
    } yield (k, s, x))
    samples(Gen.zip(snapGen, snapGen), 6).foreach { case (o, n) =>
      // dedup keys (snapshots are keyed tables)
      val oldRows = o.groupBy(_._1).map(_._2.head).toSeq
      val newRows = n.groupBy(_._1).map(_._2.head).toSeq
      val oldDf = oldRows.toDF("k", "s", "x")
      val newDf = newRows.toDF("k", "s", "x")
      val diff = graft.scale.Cdc.snapshotDiff(oldDf, newDf,
        Seq("k"), Seq("s", "x"))
      // apply diff as an upsert batch onto the old snapshot
      val changes = diff.withColumn("op",
        when(col("change_type") === "D", "D").otherwise("U"))
        .withColumn("ver", lit(2L)).drop("change_type")
      val merged = graft.scale.Cdc.upsert(
        oldDf.withColumn("ver", lit(1L)), changes, Seq("k"), "ver")
        .select("k", "s", "x").as[(Long, String, Double)].collect().toSet
      assert(merged === newRows.toSet)
      // and the diff is minimal: no unchanged key appears
      val unchanged = oldRows.toSet.intersect(newRows.toSet).map(_._1)
      val diffKeys = diff.select("k").as[Long].collect().toSet
      assert(diffKeys.intersect(unchanged).isEmpty)
    }
  }

  test("pageRank == driver-side fixed-point reference on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(25, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
    samples(edgeGen, 5).foreach { raw =>
      val edges = raw.distinct
      val df = edges.toDF("s", "t")
      val got = graft.scale.Graph.pageRank(df, "s", "t", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // reference: same fixed-point units, same floor divisions
      val S = graft.scale.Graph.Scale
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var r = nodes.map(_ -> S / nodes.size).toMap
      (1 to 3).foreach { _ =>
        val sums = edges.groupBy(_._2).view.mapValues(es =>
          es.map(e => r(e._1) / deg(e._1)).sum).toMap
        r = nodes.map(id => id ->
          ((S / 100L) * 15L / nodes.size + 85L * sums.getOrElse(id, 0L) / 100L)
        ).toMap
      }
      val want = r.map { case (id, u) => id -> u.toDouble / S.toDouble }
      assert(got === want)
    }
  }

  test("ewma equals the direct weighted mean of each trailing frame") {
    import spark.implicits._
    val rowsGen = Gen.listOfN(25, for {
      k <- Gen.oneOf(1L, 2L)
      t <- Gen.choose(0L, 1000000L)
      v <- Gen.choose(-50.0, 50.0)
    } yield (k, t, v))
    samples(rowsGen, 5).foreach { raw =>
      // unique (k, t) so the window order is total
      val rows = raw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val df = rows.map { case (k, t, v) =>
        (k, new java.sql.Timestamp(t), v) }.toDF("k", "ts", "v")
      val got = graft.scale.TimeSeries
        .ewmaBounded(df, "k", Seq("ts"), "v", alpha = 0.5, window = 4)
        .select(col("k"), unix_millis(col("ts")), col("ewma"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      rows.groupBy(_._1).foreach { case (k, g) =>
        val ordered = g.sortBy(_._2)
        ordered.zipWithIndex.foreach { case ((_, t, _), i) =>
          val frame = ordered.slice(math.max(0, i - 3), i + 1).map(_._3)
          val wts = frame.indices.map(j =>
            math.pow(0.5, (frame.size - 1 - j).toDouble))
          val want = BigDecimal(
            frame.zip(wts).map { case (v, w) => v * w }.foldLeft(0.0)(_ + _) /
              wts.foldLeft(0.0)(_ + _))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(got((k, t)) === want, s"k=$k t=$t frame=$frame")
        }
      }
    }
  }

  test("jaccard: bounded, symmetric, 1 on self") {
    import spark.implicits._
    val arrGen = Gen.listOfN(12, Gen.choose(0L, 20L))
    val pairs = samples(Gen.zip(arrGen, arrGen), 10)
    val df = pairs.toDF("a", "b")
    val rs = df.select(
      graft.scale.Dedup.jaccard(col("a"), col("b")).as("ab"),
      graft.scale.Dedup.jaccard(col("b"), col("a")).as("ba"),
      graft.scale.Dedup.jaccard(col("a"), col("a")).as("aa")).collect()
    rs.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == 1.0)
    }
  }

  test("exactDuplicateSpans == brute-force substring reference on random corpora") {
    import spark.implicits._
    // tiny alphabets force dense exact repeats (within AND across docs);
    // the driver reference enumerates every position's L-gram, counts
    // occurrences corpus-wide, and merges covered positions into maximal
    // islands — the paper semantics, computed the slow exact way.
    val corpusGen = for {
      alpha <- Gen.choose(2, 4)
      nDocs <- Gen.choose(4, 10)
      docs <- Gen.listOfN(nDocs, Gen.choose(0, 60).flatMap(len =>
        Gen.listOfN(len, Gen.choose(0, alpha - 1).map(c => ('a' + c).toChar))))
    } yield docs.map(_.mkString)
    for ((texts, ci) <- samples(corpusGen, 6).zipWithIndex; l <- Seq(3, 5)) {
      val docs = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val got = graft.scale.Dedup.exactDuplicateSpans(docs, "doc_id",
          "text", minLen = l)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      // driver reference
      val occ = scala.collection.mutable.Map.empty[String, Int]
      for (t <- texts; p <- 0 to t.length - l) {
        val g = t.substring(p, p + l)
        occ(g) = occ.getOrElse(g, 0) + 1
      }
      val want = texts.zipWithIndex.flatMap { case (t, i) =>
        val dup = (0 to t.length - l).filter(p => occ(t.substring(p, p + l)) > 1)
        // islands: gap iff next - prev > l (1-based output positions)
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var run = List.empty[Int]
        def flush(): Unit = if (run.nonEmpty) {
          val ps = run.reverse
          spans += ((i.toLong, ps.head + 1L, ps.last + l - ps.head.toLong,
            ps.size.toLong))
          run = Nil
        }
        for (p <- dup) {
          if (run.nonEmpty && p - run.head > l) flush()
          run = p :: run
        }
        flush()
        spans
      }.toSet
      assert(got == want, s"corpus $ci L=$l: got $got want $want")
      // the APPLY step: cleaned text == brute-force covered-byte excision
      val gotClean = graft.scale.Dedup.removeExactDuplicateSpans(docs,
          "doc_id", "text", minLen = l)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val covered = Array.fill(t.length)(false)
        for (p <- 0 to t.length - l; if occ(t.substring(p, p + l)) > 1;
             j <- p until p + l) covered(j) = true
        val clean = t.indices.filterNot(covered).map(t.charAt).mkString
        val nSpans = want.count(_._1 == i.toLong).toLong
        val (gk, gc, gt) = gotClean(i.toLong)
        assert(gt == clean && gk == nSpans &&
          gc == (t.length - clean.length).toLong,
          s"corpus $ci L=$l doc $i: got ($gk,$gc,'$gt') want ($nSpans,'$clean')")
      }
    }
  }
}
