package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching at corpus scale: all unordered pairs of distinct
  * words at edit distance ≤ 1 (insert / delete / substitute) via
  * SymSpell-style DELETION NEIGHBORHOODS — the spell-normalization /
  * typo-clustering primitive of text curation.
  *
  * Why not an O(n²) similarity join: each word instead emits itself plus
  * its |w| single-deletion variants as join keys. Recall 1 for distance
  * ≤ 1 by case analysis — equal-length substitution: deleting the (one)
  * differing position from both sides yields the same variant;
  * insert/delete: the shorter word IS a deletion variant of the longer.
  * Candidates then pass an exact `levenshtein` verify (both engines'
  * standard DP), so precision is exact; transposition-like candidates
  * ("ab" / "ba" share variants but sit at distance 2) die there.
  *
  * Scale shape: the variant index is (|w|+1)·vocab rows of short strings
  * — the classic SymSpell space/time trade; pair generation reuses
  * [[Dedup.bucketPairs]] (one shared shuffle, triangle-split for hot
  * variants, each unordered pair exactly once); only (word, word) rows
  * ever shuffle, never documents.
  */
object Fuzzy {

  /** Lowercased alphabetic vocabulary of the corpus, min length
    * `minLen` (very short words make deletion variants degenerate —
    * every 2-letter word within distance 1 of every 1-letter one).
    */
  def vocabulary(docs: DataFrame, textCol: String, minLen: Int): DataFrame =
    docs.select(explode(TextOps.tokens(lower(col(textCol)))).as("w"))
      .where(col("w").rlike("^[a-z]+$") && length(col("w")) >= minLen)
      .distinct()

  /** Deterministic one-deletion corruption of each word of length ≥ 5 —
    * drops the character at 1-based position (|w| mod 3) + 2. Used by
    * q103 to seed realistic typo pairs into the tiny synthetic vocab;
    * the arithmetic is engine-portable (the oracle replays it).
    */
  def deterministicTypos(vocab: DataFrame): DataFrame = {
    val cut = (length(col("w")) % 3) + 2
    vocab.where(length(col("w")) >= 5)
      .select(concat(
        col("w").substr(lit(1), cut - 1),
        col("w").substr(cut + 1, length(col("w")))).as("w"))
      .distinct()
  }

  /** All unordered pairs of distinct input words with edit distance ≤ 1,
    * as (w1 < w2, dist). `words` must be distinct single-column frames of
    * non-null strings.
    */
  def editDistanceOnePairs(words: DataFrame, wordCol: String = "w",
      maxBucket: Int = 1000): DataFrame = {
    val w = col(wordCol)
    val deletions = transform(sequence(lit(1), length(w)),
      i => concat(w.substr(lit(1), i - 1), w.substr(i + 1, length(w))))
    val keyed = words
      .select(w.as("id"),
        explode(array_distinct(concat(array(w), deletions))).as("bk"))
    Dedup.bucketPairs(keyed, maxBucket)
      .select(col("id_a").as("w1"), col("id_b").as("w2"),
        levenshtein(col("id_a"), col("id_b")).cast("long").as("dist"))
      .where(col("dist") <= 1)
  }
}
