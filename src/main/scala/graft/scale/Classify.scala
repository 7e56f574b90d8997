package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed multinomial Naive Bayes — train and score in ONE logical
  * plan over the corpus (the classical lang-ID / topic-gate baseline the
  * hashed linear scorer of q78 graduates from when real labels exist).
  *
  * Engine-portable scoring: every log-probability is quantized ONCE to
  * integer micro-units — u(l,t) = round(10⁶·ln(c+1)), base_l =
  * round(10⁶·ln(T_l+V)), prior from round(10⁶·ln n) differences — and
  * the per-document score is then PURE int64 arithmetic:
  *
  *   score_l(doc) = prior_l + Σ_t tc_t·u(l,t) − ntok·base_l
  *
  * (the Laplace-smoothed multinomial log-likelihood times 10⁶, with the
  * unseen-term mass folded into base_l so absent (l,t) pairs cost
  * nothing). Argmax over int64 with a label-ascending tiebreak is
  * deterministic on any engine — no float comparison anywhere past the
  * single quantization, which both Spark and the oracle compute from
  * identical integers.
  *
  * Scale shape: one token explode feeds BOTH the model (label-keyed
  * aggregates; the model is a (label, term) frame, never driver state)
  * and the scoring side; terms carry their per-label units as a small
  * map (|labels| entries) through ONE term-keyed join. The |labels|×
  * expansion happens INSIDE the per-(doc, label) hash aggregate's map
  * side — partial aggregation collapses it before the exchange, so the
  * shuffled volume is docs×labels rows, not tokens×labels. The label
  * stats frame (|labels| rows) broadcasts. Empty documents (no tokens)
  * have no likelihood evidence and are excluded from the output — the
  * caller's quality gates (q21/q60) own those.
  */
object Classify {

  private val U = 1000000L

  private def lnU(x: Column): Column =
    round(lit(U).cast("double") * log(x.cast("double"))).cast("long")

  /** Per-document NB scores and prediction: (id, label, pred). Training
    * corpus = scoring corpus (the resubstitution fit). For a real
    * train/eval split use [[naiveBayesScore]], which fits on one frame
    * and scores another with proper OOV handling.
    */
  /** Model frames from a (lbl, t)-count frame and a (lbl, nl) prior
    * frame: the per-class integer-unit stats (cls, base_u, prior_u) and
    * the per-term per-class unit map (t, um).
    */
  private def modelFrames(classTerm: DataFrame,
      priors: DataFrame): (DataFrame, DataFrame) = {
    val classTot = classTerm.groupBy(col("lbl")).agg(sum(col("c")).as("tl"))
    val vocab = classTerm.select(col("t")).distinct()
      .agg(count(lit(1)).as("v"))
    val nTot = priors.agg(sum(col("nl")).as("n"))
    val stats = priors.join(classTot, "lbl")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(nTot))
      .select(col("lbl").as("cls"),
        lnU(col("tl") + col("v")).as("base_u"),
        (lnU(col("nl")) - lnU(col("n"))).as("prior_u"))
    val termUnits = classTerm
      .select(col("lbl"), col("t"), lnU(col("c") + 1L).as("u"))
      .groupBy(col("t"))
      .agg(map_from_entries(collect_list(struct(col("lbl"), col("u"))))
        .as("um"))
    (stats, termUnits)
  }

  def naiveBayes(docs: DataFrame, idCol: Column, labelCol: Column,
      textCol: Column): DataFrame =
    nbResub(docs, idCol, labelCol, explode(TextOps.tokens(textCol)))

  /** [[naiveBayes]] generalized over the term extractor: `termCol` is
    * any generator expression (exploded word tokens, exploded hashed
    * char-n-gram buckets) — the model/score plan is identical, only the
    * evidence unit changes.
    */
  private def nbResub(docs: DataFrame, idCol: Column, labelCol: Column,
      termCol: Column): DataFrame = {
    val toks = docs
      .select(idCol.as("id"), labelCol.as("lbl"), termCol.as("t"))
    val docTerm = toks.groupBy(col("id"), col("lbl"), col("t"))
      .agg(count(lit(1)).as("tc"))
    val classTerm = toks.groupBy(col("lbl"), col("t"))
      .agg(count(lit(1)).as("c"))
    val priors = docs.groupBy(labelCol.as("lbl"))
      .agg(count(lit(1)).as("nl"))
    nbScoreResub(docTerm, classTerm, priors)
  }

  /** Shared resubstitution score/argmax tail over the evidence frames:
    * docTerm (id, lbl, t, tc), classTerm (lbl, t, c), priors (lbl, nl).
    */
  private def nbScoreResub(docTerm: DataFrame, classTerm: DataFrame,
      priors: DataFrame): DataFrame = {
    val (stats, termUnits) = modelFrames(classTerm, priors)
    // LEFT join: a scoring-side token absent from the training vocabulary
    // (possible when the caller filters train/score splits) contributes
    // u = 0 for every class but still counts in ntok — it pays the full
    // −base_l unseen-mass penalty instead of silently vanishing, so
    // OOV-heavy documents aren't skewed toward artificially high scores.
    // For the resubstitution fit (train = score) no token is OOV and the
    // plan is value-identical to an inner join.
    val scored = docTerm.join(termUnits, Seq("t"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col("id"), col("lbl"), col("cls"))
      .agg(
        sum(col("tc") * coalesce(element_at(col("um"), col("cls")),
          lit(0L))).as("s"),
        sum(col("tc")).as("ntok"),
        first(col("prior_u")).as("prior_u"),
        first(col("base_u")).as("base_u"))
      .withColumn("score",
        col("prior_u") + col("s") - col("ntok") * col("base_u"))
    scored
      .withColumn("rn", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("score").desc, col("cls"))))
      .where(col("rn") === 1)
      .select(col("id"), col("lbl").as("label"), col("cls").as("pred"))
  }

  /** The bounded summary of [[naiveBayes]]: the (label, pred) confusion
    * matrix — |labels|² rows regardless of corpus size.
    */
  def naiveBayesConfusion(docs: DataFrame, idCol: Column,
      labelCol: Column, textCol: Column): DataFrame =
    naiveBayes(docs, idCol, labelCol, textCol)
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))

  /** Held-out variant: fit the multinomial NB model on `train`, score
    * `score` (which needs no label column) — the real train/eval split
    * the resubstitution fit approximates. Scoring-side tokens absent
    * from the training vocabulary (genuine OOV here) keep u = 0 for
    * every class but still count in ntok, so they pay the full
    * −base_l unseen-mass penalty — an OOV-heavy document is penalized,
    * not flattered. Documents whose tokens are ALL OOV still score
    * (prior_l − ntok·base_l): the prediction degrades gracefully to
    * the prior argmax instead of dropping the document.
    *
    * Same scale shape as [[naiveBayes]]: the model is a (t, um) frame
    * joined once on the term key; the |labels| stats frame broadcasts;
    * the |labels|× expansion collapses map-side. Output: (id, pred)
    * for every non-empty scored document.
    */
  def naiveBayesScore(train: DataFrame, score: DataFrame, idCol: Column,
      labelCol: Column, textCol: Column): DataFrame =
    nbHeldOut(train, score, idCol, labelCol,
      explode(TextOps.tokens(textCol)))

  /** [[naiveBayesScore]] generalized over the term extractor (same
    * contract as [[nbResub]]'s `termCol`): the SAME expression derives
    * terms on the train and score frames, so the model and the evidence
    * live in one term space by construction.
    */
  private def nbHeldOut(train: DataFrame, score: DataFrame, idCol: Column,
      labelCol: Column, termCol: Column): DataFrame = {
    val classTerm = train
      .select(labelCol.as("lbl"), termCol.as("t"))
      .groupBy(col("lbl"), col("t")).agg(count(lit(1)).as("c"))
    val priors = train.groupBy(labelCol.as("lbl"))
      .agg(count(lit(1)).as("nl"))
    val docTerm = score
      .select(idCol.as("id"), termCol.as("t"))
      .groupBy(col("id"), col("t")).agg(count(lit(1)).as("tc"))
    nbScoreHeldOut(docTerm, classTerm, priors)
  }

  /** Shared held-out score/argmax tail over the evidence frames:
    * docTerm (id, t, tc), classTerm (lbl, t, c), priors (lbl, nl).
    */
  private def nbScoreHeldOut(docTerm: DataFrame, classTerm: DataFrame,
      priors: DataFrame): DataFrame = {
    val (stats, termUnits) = modelFrames(classTerm, priors)
    val scored = docTerm.join(termUnits, Seq("t"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(col("id"), col("cls"))
      .agg(
        sum(col("tc") * coalesce(element_at(col("um"), col("cls")),
          lit(0L))).as("s"),
        sum(col("tc")).as("ntok"),
        first(col("prior_u")).as("prior_u"),
        first(col("base_u")).as("base_u"))
      .withColumn("score",
        col("prior_u") + col("s") - col("ntok") * col("base_u"))
    scored
      .withColumn("rn", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("score").desc, col("cls"))))
      .where(col("rn") === 1)
      .select(col("id"), col("cls").as("pred"))
  }

  /** Held-out confusion matrix: [[naiveBayesScore]] joined back to the
    * scoring frame's true labels — |labels|² rows.
    */
  def naiveBayesHeldOutConfusion(train: DataFrame, score: DataFrame,
      idCol: Column, labelCol: Column, textCol: Column): DataFrame =
    naiveBayesScore(train, score, idCol, labelCol, textCol)
      .join(score.select(idCol.as("id"), labelCol.as("label")), "id")
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))

  /** Hashed char-n-gram term buckets — the fastText/CCNet lang-ID
    * feature space: every length-`n` character window of the text,
    * 62-bit portable-hashed ([[graft.functions.NativeExpressions
    * .portable_token_hashes]], so a DuckDB oracle replays each bucket
    * bit for bit) and folded into `buckets` residues. Texts shorter
    * than `n` (including empty) contribute their whole text as one
    * gram — every doc yields ≥ 1 term, so no doc degrades to a
    * prior-only score silently (the [[graft.scale.Dedup
    * .portableShingles]] short-doc convention). Hashing bounds the
    * model at ≤ |labels|·buckets rows regardless of corpus size — the
    * trick that makes a trained n-gram profile shippable at 100 TB.
    */
  def charNgramBuckets(textCol: Column, n: Int, buckets: Int): Column = {
    require(n > 0, s"n must be positive: $n")
    require(buckets > 0, s"buckets must be positive: $buckets")
    val grams = when(length(textCol) >= n,
      transform(sequence(lit(1), length(textCol) - (n - 1)),
        i => substring(textCol, i, lit(n))))
      .otherwise(array(textCol))
    transform(
      graft.functions.NativeExpressions.portable_token_hashes(grams),
      h => pmod(h, lit(buckets.toLong)))
  }

  /** Collect the BOUNDED char-n-gram NB model into broadcast-sized
    * arrays: labels ascending (UTF8 binary order — the argmax tiebreak
    * the SQL window used), u flattened label-major (labels × buckets),
    * prior/base per label. The model is ≤ |labels| × `buckets` int64
    * cells BY CONTRACT (hashing bounds the term space — the same
    * property the scaladoc below calls "what makes a trained n-gram
    * profile shippable at 100 TB"), so collecting it is bounded driver
    * state exactly like [[Clustering.lloydTrain]]'s centroid matrix.
    * The per-(lbl, t) integer units are computed by the SAME Spark
    * expressions as the distributed formulation ([[lnU]] over the
    * aggregated counts), so the collected model is value-identical.
    */
  private def ngramModel(train: DataFrame, labelCol: Column,
      textCol: Column, n: Int, buckets: Int)
      : (Array[String], Array[Long], Array[Long], Array[Long]) = {
    val countsCol = graft.functions.NativeExpressions
      .char_ngram_bucket_counts(textCol, n, buckets)
    val classTerm = graft.core.Par.ensure(train)
      .select(labelCol.as("lbl"), explode(countsCol).as(Seq("t", "tc")))
      .groupBy(col("lbl"), col("t")).agg(sum(col("tc")).as("c"))
    val priors = train.groupBy(labelCol.as("lbl"))
      .agg(count(lit(1)).as("nl"))
    val (stats, _) = modelFrames(classTerm, priors)
    val statRows = stats.select(col("cls"), col("base_u"), col("prior_u"))
      .collect()
    val labels = statRows.map(_.getString(0)).sortWith((a, b) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0)
    val idx = labels.zipWithIndex.toMap
    val base = new Array[Long](labels.length)
    val prior = new Array[Long](labels.length)
    statRows.foreach { r =>
      val l = idx(r.getString(0))
      base(l) = r.getLong(1); prior(l) = r.getLong(2)
    }
    val u = new Array[Long](labels.length * buckets)
    classTerm.select(col("lbl"), col("t"), lnU(col("c") + 1L).as("u"))
      .collect().foreach { r =>
        u(idx(r.getString(0)) * buckets + r.getLong(1).toInt) = r.getLong(2)
      }
    (labels, u, prior, base)
  }

  /** TRAINED char-n-gram language-ID — the CCNet/fastText pipeline's
    * classifier, replacing [[TextOps.langIdFromStats]]' fixed stopword
    * heuristic with per-language n-gram PROFILES fitted on labeled
    * text: multinomial NB ([[naiveBayes]]'s exact integer micro-unit
    * arithmetic — u(l,b) = round(10⁶·ln(c+1)) over hashed char-n-gram
    * bucket counts, int64 score sums, argmax with label tiebreak) over
    * [[charNgramBuckets]] evidence. Character n-grams see script AND
    * orthography (the reason fastText lang-ID uses them), so languages
    * sharing an alphabet separate where stopword voting cannot —
    * ClassifySpec's multi-script fixture pins the accuracy win.
    * Resubstitution fit (train = score); returns (id, label, pred).
    *
    * Plan shape: the model aggregate collects to bounded arrays
    * ([[ngramModel]]); scoring is then ONE narrow codegen projection
    * ([[graft.functions.NbBucketArgmax]] — count, score, argmax fused),
    * with no model join, no |labels|× expansion, and no per-doc window.
    * Int64 score arithmetic is order-insensitive, so results are
    * value-identical to the exploded SQL formulation (ClassifySpec pins
    * the multi-script fixture; q219's oracle hash-matches end to end).
    */
  def langIdNgram(docs: DataFrame, idCol: Column, labelCol: Column,
      textCol: Column, n: Int = 3, buckets: Int = 4096): DataFrame = {
    val (labels, u, prior, base) =
      ngramModel(docs, labelCol, textCol, n, buckets)
    if (labels.isEmpty)
      return docs.where(lit(false)).select(idCol.as("id"),
        labelCol.as("label"), labelCol.as("pred"))
    val labelsLit = array(labels.toIndexedSeq.map(lit): _*)
    graft.core.Par.ensure(docs).select(idCol.as("id"),
      labelCol.as("label"),
      element_at(labelsLit, graft.functions.NativeExpressions
        .nb_bucket_argmax(textCol, n, buckets, u, prior, base) + 1)
        .as("pred"))
  }

  /** The bounded summary of [[langIdNgram]]: the (label, pred)
    * confusion matrix — |labels|² rows regardless of corpus size.
    */
  def langIdNgramConfusion(docs: DataFrame, idCol: Column,
      labelCol: Column, textCol: Column, n: Int = 3,
      buckets: Int = 4096): DataFrame =
    langIdNgram(docs, idCol, labelCol, textCol, n, buckets)
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"))

  /** Per-PARAGRAPH language segmentation — the CCNet shape [[langIdNgram]]
    * is doc-level for: real crawl pages mix languages (boilerplate in one,
    * body in another; quoted passages), and a doc-level gate either drops
    * the page or pollutes the corpus. Fit the char-n-gram profiles on
    * `train` ([[langIdNgramScore]]'s frozen-model contract), split each
    * scored doc at `paraSep`, predict every paragraph independently
    * (int64 NB argmax, label tiebreak), then summarize per doc: the
    * MAJORITY language (paragraph-count argmax, label-ascending tiebreak),
    * how many paragraphs it keeps, and the kept paragraphs' text
    * reassembled in original order (the q62 explode/reassemble shape) —
    * ready for the downstream perplexity gate.
    *
    * Whitespace-only paragraphs are dropped before scoring; documents
    * with no scorable paragraph are excluded (the quality gates own
    * those). Single-language documents pass through intact by
    * construction — every paragraph predicts the same label, so n_kept =
    * n_paras and text_kept is the original text modulo separator
    * normalization (ClassifySpec pins it).
    *
    * Scale shape: one posexplode (rows = paragraphs, each carrying only
    * its own text), then prediction as ONE narrow broadcast-model
    * projection ([[graft.functions.NbBucketArgmax]] — the model arrays
    * are bounded at |labels|·buckets by contract, collected like
    * [[Clustering.lloydTrain]]'s centroids), one doc-keyed window for
    * the majority, one doc-keyed reassembly aggregate. No paras ⋈ preds
    * join and no corpus-sized driver state. Returns
    * (doc_id, lang, n_paras, n_kept, text_kept).
    */
  def langIdSegmentParagraphs(train: DataFrame, docs: DataFrame,
      idCol: String, labelCol: String, textCol: String, n: Int = 3,
      buckets: Int = 4096, paraSep: String = "\n\n"): DataFrame = {
    require(paraSep.nonEmpty, "paraSep must be non-empty")
    val paras = docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(paraSep))).as(Seq("idx", "__para")))
      .where(length(trim(col("__para"))) > 0)
      .withColumnRenamed("__para", textCol)
    val (labels, u, prior, base) =
      ngramModel(train, col(labelCol), col(textCol), n, buckets)
    require(labels.nonEmpty, "langIdSegmentParagraphs over an empty train")
    val labelsLit = array(labels.toIndexedSeq.map(lit): _*)
    // prediction is a narrow projection of the paragraph frame (the
    // broadcast-model fold), so no paras ⋈ preds join exists anymore
    val withPara = graft.core.Par.ensure(paras)
      .select(col("doc_id"), col("idx"), col(textCol).as("para"),
        element_at(labelsLit, graft.functions.NativeExpressions
          .nb_bucket_argmax(col(textCol), n, buckets, u, prior, base) + 1)
          .as("pred"))
    val dominant = withPara.groupBy(col("doc_id"), col("pred"))
      .agg(count(lit(1)).as("np"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("np").desc, col("pred"))))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("pred").as("lang"))
    withPara.join(dominant, "doc_id")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_paras"),
        sum((col("pred") === col("lang")).cast("long")).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("pred") === col("lang"),
              struct(col("idx"), col("para"))))),
            e => e.getField("para")),
          paraSep).as("text_kept"))
  }

  /** Held-out [[langIdNgram]]: fit the per-language n-gram profiles on
    * `train`, predict `score` (no label column needed) — the deployment
    * shape: train once on labeled seed text, gate the crawl with the
    * frozen profiles. OOV buckets keep u = 0 but still pay the
    * −base_l unseen mass, exactly [[naiveBayesScore]]'s contract.
    * Returns (id, pred).
    */
  def langIdNgramScore(train: DataFrame, score: DataFrame, idCol: Column,
      labelCol: Column, textCol: Column, n: Int = 3,
      buckets: Int = 4096): DataFrame = {
    val (labels, u, prior, base) =
      ngramModel(train, labelCol, textCol, n, buckets)
    if (labels.isEmpty)
      return score.where(lit(false))
        .select(idCol.as("id"), lit("").as("pred"))
    val labelsLit = array(labels.toIndexedSeq.map(lit): _*)
    graft.core.Par.ensure(score).select(idCol.as("id"),
      element_at(labelsLit, graft.functions.NativeExpressions
        .nb_bucket_argmax(textCol, n, buckets, u, prior, base) + 1)
        .as("pred"))
  }
}
