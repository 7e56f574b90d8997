package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID, document fingerprinting.
  *
  * All pure column expressions (whole-stage codegen, no UDFs) — each runs as
  * a narrow map over the documents scan, so they scale linearly with no
  * shuffle at any data size.
  */
object TextOps {

  /** Whitespace tokenization, empty tokens removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pre-tokenizer pattern, restricted to RE2-compatible
    * syntax (no lookahead) so the SAME pattern runs on Spark (java.util
    * .regex) and DuckDB (RE2) with identical match counts: contractions,
    * optional-space letter runs, optional-space digit runs, optional-space
    * punctuation runs. Whitespace between matches is skipped by the
    * scanner (no whitespace branch), so the match count IS the token
    * count.
    */
  val BpeTokenPattern: String =
    "'(?:s|d|m|t|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+"

  /** BPE-ish token count: number of pre-tokenizer matches — the standard
    * cheap estimator for "how many BPE tokens will this document cost"
    * without a vocab file. Narrow codegen'd map (regexp_count), no
    * shuffle.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern))

  /** Mean token length (null on empty docs). */
  def avgTokenLen(toks: Column): Column = {
    val totalLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    when(size(toks) > 0, totalLen.cast("double") / size(toks).cast("double"))
  }

  /** Count of the punctuation characters `.,;:!?` — as length minus the
    * length with those characters translated away (codegen'd `translate`
    * instead of a full-document `regexp_replace` rewrite; identical counts).
    */
  def punctCount(text: Column): Column =
    length(text) - length(translate(text, ".,;:!?", ""))

  /** Punctuation characters / total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      punctCount(text).cast("double") / length(text).cast("double"))

  /** Per-language stopword lists for the heuristic scorer. Tiny on purpose:
    * broadcast as literals into the expression (no join).
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "en", "du", "que"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "zai", "ta", "men", "zhe"))

  def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(Stopwords(lang).map(lit): _*)))

  /** Ratio of (any-language) stopwords among tokens. */
  def stopwordRatio(toks: Column): Column = {
    val all = Stopwords.values.flatten.toSeq.distinct.sorted
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(all.map(lit): _*))).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, nonzero stopword mass (mirrors the reference's rule-based
    * scoring style, mrp_website.py:184-204, applied to text quality).
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val lenScore = least(size(toks).cast("double") / lit(50.0), lit(1.0))
    val punct = coalesce(punctRatio(text), lit(0.0))
    val punctScore = when(punct <= 0.1, lit(1.0)).otherwise(
      greatest(lit(0.0), lit(1.0) - (punct - lit(0.1)) * lit(5.0)))
    val stopScore = least(coalesce(stopwordRatio(toks), lit(0.0)) * lit(4.0), lit(1.0))
    (lenScore * lit(0.4) + punctScore * lit(0.3) + stopScore * lit(0.3))
  }

  /** Language-ID by stopword voting: argmax over per-language hit counts with
    * a deterministic preference order on ties.
    */
  def langId(toks: Column): Column = {
    val langs = Seq("en", "es", "fr", "de", "zh")
    val hits = langs.map(l => l -> stopwordHits(toks, l))
    // first language whose count >= all others (ties -> earlier in list)
    val maxHits = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldLeft(when(lit(false), "und")) { case (acc, (l, h)) =>
      acc.when(h === maxHits, l)
    }.otherwise("und")
  }

  /** Fixed language order for the stats-array layout (and the langId tie
    * preference — first language with the max vote wins).
    */
  val Langs: Seq[String] = Seq("en", "es", "fr", "de", "zh")

  /** Single-pass native statistics array over a token column (see
    * [[graft.functions.TextStats]]): materialize ONCE with `withColumn`,
    * then derive every quality/language metric from it. Layout:
    * [1]=Σ token chars, [2]=any-stopword hits, [3..7]=per-language hits
    * (1-based element_at indexing).
    */
  def stats(toks: Column): Column =
    graft.functions.NativeExpressions.text_stats(toks, Stopwords, Langs)

  /** avgTokenLen from a materialized stats array (== [[avgTokenLen]]). */
  def avgTokenLenFromStats(st: Column, nToks: Column): Column =
    when(nToks > 0, element_at(st, 1).cast("double") / nToks.cast("double"))

  /** stopwordRatio from a materialized stats array (== [[stopwordRatio]]). */
  def stopwordRatioFromStats(st: Column, nToks: Column): Column =
    when(nToks > 0, element_at(st, 2).cast("double") / nToks.cast("double"))

  /** qualityScore from a materialized stats array and punct-ratio column —
    * identical arithmetic (same operation order) to [[qualityScore]], minus
    * 4 interpreted array passes and a duplicate punctuation scan.
    */
  def qualityScoreFromStats(punctRatioCol: Column, st: Column, nToks: Column): Column = {
    val lenScore = least(nToks.cast("double") / lit(50.0), lit(1.0))
    val punct = coalesce(punctRatioCol, lit(0.0))
    val punctScore = when(punct <= 0.1, lit(1.0)).otherwise(
      greatest(lit(0.0), lit(1.0) - (punct - lit(0.1)) * lit(5.0)))
    val stopScore = least(
      coalesce(stopwordRatioFromStats(st, nToks), lit(0.0)) * lit(4.0), lit(1.0))
    (lenScore * lit(0.4) + punctScore * lit(0.3) + stopScore * lit(0.3))
  }

  /** langId from a materialized stats array (== [[langId]]: argmax with
    * ties to the earlier language in [[Langs]]).
    */
  def langIdFromStats(st: Column): Column = {
    val hits = Langs.zipWithIndex.map { case (l, i) => l -> element_at(st, 3 + i) }
    val maxHits = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldLeft(when(lit(false), "und")) { case (acc, (l, h)) =>
      acc.when(h === maxHits, l)
    }.otherwise("und")
  }

  /** Word n-gram shingles (1-based element_at indexing, portable order). */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array(concat_ws(" ", toks))))

  /** Content-defined fingerprint: min of shingle hashes (winnowing-style
    * bottom sketch, k=1). Equal fingerprints => likely near-duplicate heads;
    * used as a cheap pre-cluster key before pairwise verification.
    *
    * Takes a MATERIALIZED per-token-hash column (`transform(toks, xxhash64)`
    * written out via `withColumn` first) and builds shingles from the hashes
    * (Dedup.hashedShingles) — no shingle strings are ever concatenated, which
    * dominated the original string-shingle profile 8:1 over the hash math.
    * array_min over the rotate-XOR multiset equals min over the distinct set,
    * so no array_distinct is needed.
    */
  def fingerprintFromHashes(tokenHashes: Column, n: Int = 3): Column =
    array_min(Dedup.hashedShingles(tokenHashes, n))

  /** Character-level rolling-hash fingerprint (winnowing bottom-1 over
    * `window`-byte Rabin-Karp hashes; native codegen kernel). Unlike the
    * shingle fingerprint it is tokenization-insensitive and catches
    * byte-level near-dups (whitespace/punctuation edits).
    */
  def rollingFingerprint(text: Column, window: Int = 32): Column =
    graft.functions.NativeExpressions.rolling_hash_min(text, window)

  /** String-shingle fingerprint (historical formulation; kept only as the
    * slow reference for tests — concatenates every shingle before hashing).
    */
  def fingerprintStringShingles(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(tokens(text), n), s => xxhash64(s)))
}
