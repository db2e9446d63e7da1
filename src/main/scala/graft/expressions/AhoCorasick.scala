package graft.expressions

/** Frozen Aho–Corasick automaton for multi-pattern substring counting —
  * the blocklist screen's scale kernel. One pass over the text counts
  * EVERY occurrence of EVERY pattern (overlapping included, the classic
  * AC semantics) in O(text + matches), independent of pattern count —
  * where a regex alternation or per-pattern `contains` loop pays
  * O(text × patterns). At 100 TB with a 10⁴-term blocklist that factor
  * is the difference between a scan-speed filter and a cluster-melting
  * one.
  *
  * Layout is struct-of-arrays so the serialized form shipped to
  * executors (via the codegen reference array) is a handful of primitive
  * arrays, not a node graph: per-node sorted transition chars + parallel
  * targets (binary-searched), failure links, and `outCnt` — the number
  * of patterns ending at the node INCLUDING its whole failure chain,
  * pre-folded at build time so the hot loop never walks suffix links for
  * output (Aho & Corasick 1975 §6's standard optimization).
  */
final class AhoCorasick private (
    private val chars: Array[Array[Char]],
    private val next: Array[Array[Int]],
    private val fail: Array[Int],
    private val outCnt: Array[Int]) extends Serializable {

  /** Total occurrences of all patterns in `s` (overlapping counted). */
  def countMatches(s: String): Long = {
    var st = 0
    var total = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      // chase failure links until a transition on c exists or we are at
      // the root (which absorbs unknown chars); amortized O(1) per char
      var moved = false
      while (!moved) {
        val idx = java.util.Arrays.binarySearch(chars(st), c)
        if (idx >= 0) { st = next(st)(idx); moved = true }
        else if (st == 0) moved = true
        else st = fail(st)
      }
      total += outCnt(st)
      i += 1
    }
    total
  }
}

object AhoCorasick {

  /** Build the automaton. Duplicate patterns each count (two copies of
    * a pattern in the list double its per-occurrence weight) — callers
    * wanting set semantics dedupe first. Empty patterns are rejected:
    * "" would match at every position and only poison counts.
    */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(patterns.forall(_.nonEmpty), "empty pattern is not screenable")
    // trie in growable form
    val trans = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(0)
    patterns.foreach { p =>
      var node = 0
      p.foreach { c =>
        node = trans(node).getOrElseUpdate(c, {
          trans += scala.collection.mutable.TreeMap.empty[Char, Int]
          ends += 0
          trans.length - 1
        })
      }
      ends(node) += 1
    }
    val n = trans.length
    val fail = new Array[Int](n)
    val outCnt = ends.toArray
    // BFS: child fail = deepest proper-suffix node; outCnt folds the
    // failure chain so matching never re-walks it
    val queue = scala.collection.mutable.Queue.empty[Int]
    trans(0).foreach { case (_, child) => fail(child) = 0; queue += child }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outCnt(u) += outCnt(fail(u))
      trans(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !trans(f).contains(c)) f = fail(f)
        fail(v) = trans(f).get(c).filter(_ != v).getOrElse(0)
        queue += v
      }
    }
    val chars = trans.map(_.keysIterator.toArray).toArray // TreeMap: sorted
    val next = trans.map(_.valuesIterator.toArray).toArray
    new AhoCorasick(chars, next, fail, outCnt)
  }
}
