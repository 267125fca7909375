package graft.text

import scala.collection.mutable

/** Aho-Corasick multi-pattern matcher (Aho & Corasick, CACM 1975):
  * one automaton pass per document counts EVERY occurrence of every
  * pattern — including overlapping occurrences and patterns nested
  * inside other patterns (via suffix/output links) — in O(|text| +
  * matches), independent of the number of patterns.
  *
  * The blocklist-filter primitive of a training-data pipeline: at
  * 100 TB the automaton is built once on the driver from the (small)
  * term list and ships in the task closure, so filtering is a pure
  * map-side scan — vs P per-pattern passes, or a backtracking regex
  * union whose cost grows with P.
  *
  * Matching semantics are exactly "count the positions i where
  * substr(text, i, len(p)) == p", which is what the DuckDB oracle
  * enumerates — so overlapping and self-overlapping occurrences agree
  * by construction (a greedy replace()-based count would not).
  */
final class AhoCorasick private (
    gotoT: Array[Map[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val nPatterns: Int)
    extends Serializable {

  /** Per-pattern occurrence counts over `text` (all occurrences). */
  def countAll(text: String): Array[Long] = {
    val counts = new Array[Long](nPatterns)
    if (text == null) return counts
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      while (state != 0 && !gotoT(state).contains(c)) state = fail(state)
      state = gotoT(state).getOrElse(c, 0)
      val outs = out(state)
      var j = 0
      while (j < outs.length) { counts(outs(j)) += 1; j += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  /** Build the automaton (goto trie + BFS failure links + flattened
    * output links). Patterns must be non-empty and distinct. */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "non-empty patterns")
    require(patterns.distinct.size == patterns.size, "distinct patterns")
    val gotoB = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val outB = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = gotoB(s).getOrElseUpdate(c, {
          gotoB += mutable.Map.empty
          outB += mutable.ArrayBuffer.empty
          gotoB.size - 1
        })
      }
      outB(s) += pi
    }
    val fail = new Array[Int](gotoB.size)
    val queue = mutable.Queue.empty[Int]
    gotoB(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoB(r).foreach { case (c, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !gotoB(f).contains(c)) f = fail(f)
        fail(s) = gotoB(f).get(c).filter(_ != s).getOrElse(0)
        // BFS order: fail(s) is strictly shallower, already flattened
        outB(s) ++= outB(fail(s))
      }
    }
    new AhoCorasick(gotoB.map(_.toMap).toArray, fail,
      outB.map(_.toArray).toArray, patterns.size)
  }
}
