package graft.functions

/** Aho–Corasick multi-pattern automaton (Aho & Corasick 1975), built once
  * on the driver and broadcast — the kernel behind
  * [[graft.scale.Curation.blocklistCounts]] / `blocklistFilter` (the C4
  * "bad words" page gate, Raffel et al. 2020 §2.2, scaled from one regex
  * to thousands of literal patterns).
  *
  * Shape: a char-level trie with BFS failure links and dictionary-suffix
  * links, flattened to primitive arrays (sorted child keys + binary-search
  * goto) so the match loop allocates nothing. One pass over the text
  * counts EVERY occurrence of EVERY pattern — overlapping matches and
  * patterns nested inside other patterns included — in
  * O(text + matches) amortized, independent of pattern count. Memory is
  * O(total pattern chars): a 10k-entry blocklist is a few hundred KB,
  * broadcast once per executor, never per task.
  *
  * Matching is case-sensitive over UTF-16 code units (callers that want
  * case folding lower-case the column first — one codegen'd `lower()`);
  * patterns with supplementary characters work unchanged because both
  * sides walk the same char sequence.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "at least one pattern")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty")
  require(patterns.distinct.length == patterns.length,
    "patterns must be distinct (counts are per pattern)")

  // flattened trie: per node a sorted char array + parallel child ids
  val (childKeys: Array[Array[Char]], childVals: Array[Array[Int]],
      fail: Array[Int], emit: Array[Int], dict: Array[Int]) = {
    val keys = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val emitB = scala.collection.mutable.ArrayBuffer(-1)
    // insert
    for (p <- patterns.indices) {
      var u = 0
      for (c <- patterns(p)) {
        u = keys(u).getOrElse(c, {
          keys += scala.collection.mutable.TreeMap.empty[Char, Int]
          emitB += -1
          keys(u)(c) = keys.length - 1
          keys.length - 1
        })
      }
      emitB(u) = p
    }
    val n = keys.length
    val failB = new Array[Int](n)
    val dictB = Array.fill(n)(-1)
    // BFS failure + dictionary links
    val queue = scala.collection.mutable.Queue.empty[Int]
    for ((_, v) <- keys(0)) { failB(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      dictB(u) =
        if (emitB(failB(u)) >= 0) failB(u) else dictB(failB(u))
      for ((c, v) <- keys(u)) {
        var f = failB(u)
        while (f != 0 && !keys(f).contains(c)) f = failB(f)
        failB(v) = keys(f).get(c).filter(_ != v).getOrElse(0)
        queue += v
      }
    }
    (keys.map(_.keys.toArray).toArray,
      keys.map(_.values.toArray).toArray,
      failB, emitB.toArray, dictB)
  }

  @inline private def goTo(u: Int, c: Char): Int = {
    val ks = childKeys(u)
    var lo = 0
    var hi = ks.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ks(mid) == c) return childVals(u)(mid)
      else if (ks(mid) < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Occurrences of each pattern in `s` (all start positions, overlaps
    * and nested patterns included), indexed like `patterns`.
    */
  def counts(s: String): Array[Long] = {
    val out = new Array[Long](patterns.length)
    var u = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      var v = u
      var nxt = goTo(v, c)
      while (nxt < 0 && v != 0) { v = fail(v); nxt = goTo(v, c) }
      u = if (nxt >= 0) nxt else 0
      var w = if (emit(u) >= 0) u else dict(u)
      while (w >= 0) { out(emit(w)) += 1; w = dict(w) }
      i += 1
    }
    out
  }

  /** Longest pattern-match length beginning at each position of `s`
    * (0 = no match starts there) — the candidate table a
    * leftmost-longest scrub rebuilds from (AC emits by END position;
    * start = end − len + 1). Same single pass as [[counts]].
    */
  def longestMatchPerStart(s: String): Array[Int] = {
    val n = s.length
    val bestLen = new Array[Int](math.max(n, 1))
    var u = 0
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var v = u
      var nxt = goTo(v, c)
      while (nxt < 0 && v != 0) { v = fail(v); nxt = goTo(v, c) }
      u = if (nxt >= 0) nxt else 0
      var w = if (emit(u) >= 0) u else dict(u)
      while (w >= 0) {
        val l = patterns(emit(w)).length
        val st = i - l + 1
        if (l > bestLen(st)) bestLen(st) = l
        w = dict(w)
      }
      i += 1
    }
    bestLen
  }

  /** Total occurrences across all patterns — the page-gate scalar;
    * same pass, no per-pattern array.
    */
  def total(s: String): Long = {
    var acc = 0L
    var u = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      var v = u
      var nxt = goTo(v, c)
      while (nxt < 0 && v != 0) { v = fail(v); nxt = goTo(v, c) }
      u = if (nxt >= 0) nxt else 0
      var w = if (emit(u) >= 0) u else dict(u)
      while (w >= 0) { acc += 1; w = dict(w) }
      i += 1
    }
    acc
  }
}
