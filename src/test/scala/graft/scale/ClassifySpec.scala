package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins multinomial NB against a driver-side replay of the exact
  * micro-unit model (same quantization, same int64 score algebra, same
  * argmax tiebreak) plus the separability sanity property.
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def replay(docs: Seq[(Long, String, String)])
      : Map[Long, (String, String)] = {
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val U = 1000000L
    def lnU(x: Long): Long = math.round(U.toDouble * math.log(x.toDouble))
    val byClass = docs.groupBy(_._2)
    val classTerm = byClass.map { case (l, ds) =>
      l -> ds.flatMap(d => toks(d._3)).groupBy(identity)
        .map { case (t, ts) => t -> ts.length.toLong }
    }
    val vocab = classTerm.values.flatMap(_.keys).toSet.size.toLong
    val nTot = docs.length.toLong
    val labels = byClass.keys.toSeq.sorted
    val stats = labels.map { l =>
      val tl = classTerm(l).values.sum
      l -> ((lnU(tl + vocab), lnU(byClass(l).length.toLong) - lnU(nTot)))
    }.toMap
    docs.map { case (id, truth, text) =>
      val tc = toks(text).groupBy(identity)
        .map { case (t, ts) => t -> ts.length.toLong }
      val ntok = tc.values.sum
      val scores = labels.map { l =>
        val (baseU, priorU) = stats(l)
        val s = tc.map { case (t, n) =>
          n * classTerm(l).get(t).map(c => lnU(c + 1)).getOrElse(0L)
        }.sum
        l -> (priorU + s - ntok * baseU)
      }
      val best = scores.sortBy { case (l, s) => (-s, l) }.head._1
      id -> ((truth, best))
    }.toMap
  }

  test("naiveBayes == driver-side micro-unit replay on a mixed corpus") {
    val rnd = new scala.util.Random(177)
    val enWords = Seq("the", "cat", "dog", "house", "runs", "blue")
    val frWords = Seq("le", "chat", "chien", "maison", "court", "bleu")
    val shared = Seq("taxi", "piano", "radio")
    def doc(ws: Seq[String]) =
      (1 to rnd.nextInt(10) + 3)
        .map(_ => if (rnd.nextInt(10) < 7) ws(rnd.nextInt(ws.length))
          else shared(rnd.nextInt(shared.length)))
        .mkString(" ")
    val docs = (0 until 60).map { i =>
      if (i % 2 == 0) (i.toLong, "en", doc(enWords))
      else (i.toLong, "fr", doc(frWords))
    }
    val got = Classify.naiveBayes(docs.toDF("id", "lbl", "text"),
        col("id"), col("lbl"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2)))).toMap
    assert(got == replay(docs))
  }

  test("naiveBayesConfusion: separable vocab gives a diagonal matrix") {
    val docs = Seq(
      (1L, "a", "x x y"), (2L, "a", "x y y x"), (3L, "a", "y x"),
      (4L, "b", "u u w"), (5L, "b", "w u"), (6L, "b", "u w w u"))
      .toDF("id", "lbl", "text")
    val got = Classify.naiveBayesConfusion(docs, col("id"), col("lbl"),
        col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("a", "a") -> 3L, ("b", "b") -> 3L))
  }

  test("langIdNgram beats langIdFromStats on a multi-script fixture") {
    // Same-script content-heavy text is exactly where stopword voting
    // fails: almost no stopword hits -> vote ties -> everything falls to
    // the tie preference ('en'). The trained trigram profiles see
    // orthography (ção/ñ/sch/aux...), which separates the languages.
    // Labels match TextOps.Langs so the comparison is fair — the stats
    // heuristic CAN emit every truth label here.
    val fixture = Seq(
      (1L, "en", "wonderful weather through thursday brought sunshine"),
      (2L, "en", "strength thought although neighbour brought knight"),
      (3L, "en", "jumping quickly over twelve frozen rivers yesterday"),
      (4L, "es", "corazón montaña pequeño añejo señorita jalapeño"),
      (5L, "es", "niño español mañana cañón compañero enseñanza"),
      (6L, "es", "año señal pequeñita castañas montañoso sueño"),
      (7L, "fr", "château fenêtre garçon déjà être forêt français"),
      (8L, "fr", "hôpital théâtre bientôt château crème brûlée aperçu"),
      (9L, "fr", "beaux chevaux travaux journaux châteaux oiseaux"),
      (10L, "de", "schönheit straße müller übermäßig größe fräulein"),
      (11L, "de", "schmetterling pünktlich zwölf müde glückwunsch"),
      (12L, "de", "weißwurst schließlich tschüss überraschung schloß")
    ).toDF("doc_id", "lang", "text")
    def accuracy(pred: Map[Long, String]): Double = {
      val truth = fixture.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      truth.count { case (id, l) => pred.get(id).contains(l) }.toDouble /
        truth.size
    }
    val statsPred = fixture
      .select(col("doc_id"),
        TextOps.langIdFromStats(TextOps.stats(
          TextOps.tokens(col("text")))).as("pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ngramPred = Classify.langIdNgram(fixture, col("doc_id"),
        col("lang"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val aStats = accuracy(statsPred)
    val aNgram = accuracy(ngramPred)
    assert(aNgram == 1.0, s"trained profiles must nail the fixture: $ngramPred")
    assert(aNgram > aStats,
      s"trained $aNgram must beat heuristic $aStats ($statsPred)")
    // held-out deployment shape: frozen profiles classify UNSEEN text by
    // orthography alone (every content word is new; the trigrams aren't)
    val unseen = Seq(
      (101L, "throughout brightness weatherproof sunshine"),
      (102L, "señoría cañaveral año montañés"),
      (103L, "château forêt garçons châtaigne"),
      (104L, "schloßstraße müßig größenwahn")
    ).toDF("doc_id", "text")
    val heldOut = Classify.langIdNgramScore(fixture, unseen,
        col("doc_id"), col("lang"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(heldOut == Map(101L -> "en", 102L -> "es", 103L -> "fr",
      104L -> "de"), heldOut.toString)
  }

  private val segTrain = Seq(
    (1L, "en", "wonderful weather through thursday brought sunshine"),
    (2L, "en", "strength thought although neighbour brought knight"),
    (3L, "es", "corazón montaña pequeño añejo señorita jalapeño"),
    (4L, "es", "niño español mañana cañón compañero enseñanza"),
    (5L, "de", "schönheit straße müller übermäßig größe fräulein"),
    (6L, "de", "schmetterling pünktlich zwölf müde glückwunsch")
  ).toDF("doc_id", "lang", "text")

  test("langIdSegmentParagraphs: majority language wins, the minority " +
      "paragraph is removed, order is preserved") {
    val en1 = "throughout brightness weatherproof sunshine"
    val en2 = "thoughtful knight weather neighbour strength"
    val es1 = "señoría cañaveral año montañés"
    val mixed = Seq((10L, s"$en1\n\n$es1\n\n$en2")).toDF("doc_id", "text")
    val got = Classify.langIdSegmentParagraphs(segTrain, mixed,
      "doc_id", "lang", "text").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(1) == "en", r.toString)
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L, r.toString)
    // kept text: the two English paragraphs, original order, separator
    // normalized
    assert(r.getString(4) == s"$en1\n\n$en2", r.getString(4))
  }

  test("langIdSegmentParagraphs: single-language fast path — documents " +
      "pass through intact") {
    val docs = Seq(
      (20L, "throughout brightness sunshine\n\nknight weather strength"),
      (21L, "señoría cañaveral año\n\nmontañés niño mañana"))
      .toDF("doc_id", "text")
    val got = Classify.langIdSegmentParagraphs(segTrain, docs,
        "doc_id", "lang", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(20L)._1 == "en" && got(21L)._1 == "es", got.toString)
    // every paragraph agrees with the majority => nothing is removed and
    // the reassembled text IS the input
    docs.collect().foreach { r =>
      val (_, np, nk, kept) = got(r.getLong(0))
      assert(np == 2L && nk == 2L)
      assert(kept == r.getString(1))
    }
  }

  test("langIdSegmentParagraphs: whitespace-only paragraphs are dropped " +
      "before scoring") {
    val docs = Seq(
      (30L, "throughout brightness sunshine\n\n   \n\nknight weather"))
      .toDF("doc_id", "text")
    val got = Classify.langIdSegmentParagraphs(segTrain, docs,
      "doc_id", "lang", "text").collect().head
    assert(got.getLong(2) == 2L, got.toString) // 2 scorable paragraphs
    assert(got.getString(4) ==
      "throughout brightness sunshine\n\nknight weather")
  }

  test("langIdNgramScore (broadcast-model argmax kernel) == the SQL NB " +
      "formulation over exploded charNgramBuckets") {
    val rnd = new scala.util.Random(42)
    val pools = Map(
      "en" -> "the quick brown fox jumps over lazy dog with house".split(" "),
      "es" -> "señoría cañaveral año montañés niño mañana casa perro".split(" "),
      "ru" -> "Привет мир дом собака кошка быстро".split(" "))
    val train = (0 until 90).map { i =>
      val l = Seq("en", "es", "ru")(i % 3)
      val ws = pools(l)
      (i.toLong, l, (1 to rnd.nextInt(8) + 2)
        .map(_ => ws(rnd.nextInt(ws.length))).mkString(" "))
    }.toDF("id", "lang", "text")
    val score = (100 until 140).map { i =>
      val ws = pools(Seq("en", "es", "ru")(i % 3))
      (i.toLong, (1 to rnd.nextInt(6) + 1)
        .map(_ => ws(rnd.nextInt(ws.length))).mkString(" "))
    }.toDF("id", "text")
    for (buckets <- Seq(64, 4096)) {
      val got = Classify.langIdNgramScore(train, score, col("id"),
          col("lang"), col("text"), n = 3, buckets = buckets)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // reference: the original exploded-SQL held-out NB over the same
      // hashed char-n-gram bucket evidence (nbHeldOut via the public
      // word-token-shaped API is not reachable, so replay through
      // naiveBayesScore on pre-bucketed pseudo-tokens)
      val bucketize = (df: org.apache.spark.sql.DataFrame) => df.withColumn(
        "__toks", concat_ws(" ",
          transform(Classify.charNgramBuckets(col("text"), 3, buckets),
            b => b.cast("string"))))
      val ref = Classify.naiveBayesScore(bucketize(train), bucketize(score),
          col("id"), col("lang"), col("__toks"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == ref, s"buckets=$buckets")
    }
  }

  test("char_ngram_bucket_counts kernel == exploded charNgramBuckets " +
      "counts (ASCII, multibyte, supplementary, short, empty)") {
    val texts = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "señoría cañaveral año montañés"),
      (2L, "Привет мир Привет"),
      (3L, "日本語のテキスト処理"),
      (4L, "a😀b😀a😀b"), // surrogate pairs
      (5L, "ab"), // shorter than n=3: whole text is one gram
      (6L, "x"),
      (7L, ""), // empty: one gram, the empty string
      (8L, "aaaaaaaaaa")) // all windows identical: one bucket, count 8
    for (n <- Seq(2, 3); buckets <- Seq(64, 4096)) {
      val df = texts.toDF("id", "text")
      val viaHof = df.select(col("id"),
          explode(Classify.charNgramBuckets(col("text"), n, buckets)).as("t"))
        .groupBy(col("id"), col("t")).agg(count(lit(1)).as("tc"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val viaKernel = df.select(col("id"),
          explode(graft.functions.NativeExpressions
            .char_ngram_bucket_counts(col("text"), n, buckets))
            .as(Seq("t", "tc")))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      assert(viaKernel == viaHof, s"n=$n buckets=$buckets")
    }
  }
}
