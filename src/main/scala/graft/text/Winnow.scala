package graft.text

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003): Rabin-Karp rolling hashes of character k-grams, then the
  * minimum hash of each window of `w` consecutive k-grams (rightmost
  * minimum on ties), deduplicated by position.
  *
  * Guarantee (the paper's): any substring match of length at least
  * w + k - 1 between two documents yields at least one SHARED
  * fingerprint — so fingerprint-set intersection is a sound candidate
  * filter for copied passages (property-tested in WinnowSpec).
  *
  * One compiled pass per document, no shuffle; at 100TB the fingerprint
  * explode + groupBy(fingerprint) inverted index is the same shape as
  * the shingle/minhash pipelines.
  */
object Winnow {

  /** Rolling-hash base (odd, large enough to mix; wraps mod 2^64). */
  private val B = 1000003L

  /** Fingerprints of `text` as (sorted, distinct) hash values. */
  def fingerprints(text: String, k: Int, w: Int): Array[Long] = {
    if (text == null || text.length < k) return Array.empty[Long]
    val n = text.length
    val nGrams = n - k + 1
    // Rabin-Karp: h(i+1) = (h(i) - c_i * B^(k-1)) * B + c_{i+k}
    var bk = 1L
    var j = 1
    while (j < k) { bk *= B; j += 1 }
    val hashes = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    hashes(0) = h
    i = k
    while (i < n) {
      h = (h - text.charAt(i - k) * bk) * B + text.charAt(i)
      hashes(i - k + 1) = h
      i += 1
    }
    if (nGrams <= w) {
      // degenerate: one window covering everything -> its minimum
      var best = hashes(0); i = 1
      while (i < nGrams) {
        if (java.lang.Long.compareUnsigned(hashes(i), best) <= 0) best = hashes(i)
        i += 1
      }
      return Array(best)
    }
    // winnow: rightmost minimum per window, record only NEW positions
    val picked = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
    var start = 0
    while (start + w <= nGrams) {
      var minPos = start
      i = start + 1
      while (i < start + w) {
        if (java.lang.Long.compareUnsigned(hashes(i), hashes(minPos)) <= 0) minPos = i
        i += 1
      }
      if (!picked.contains(minPos)) picked.put(minPos, hashes(minPos))
      start += 1
    }
    // Present in the SAME unsigned order used to select window minima,
    // so fp_first/fp_last are the unsigned min/max fingerprints.
    picked.values.toArray.distinct.sorted(UnsignedOrdering)
  }

  /** Unsigned Long ordering — matches the selection comparison above. */
  private object UnsignedOrdering extends Ordering[Long] {
    def compare(a: Long, b: Long): Int = java.lang.Long.compareUnsigned(a, b)
  }

  /** Compiled UDF: text -> sorted distinct fingerprint array. */
  def fingerprintUdf(k: Int, w: Int): UserDefinedFunction =
    udf((text: String) => fingerprints(text, k, w))

  /** Winnow picks WITH positions: (1-based gram start, hash) pairs,
    * ordered by position — the anchor set for exact-substring dedup.
    * Same selection as [[fingerprints]] (rightmost tied minimum per
    * window, new positions only, same degenerate branches); positions
    * are 1-based so they line up with SQL `substr` in the oracle. */
  def anchors(text: String, k: Int, w: Int): Array[(Long, Long)] = {
    if (text == null || text.length < k) return Array.empty[(Long, Long)]
    val n = text.length
    val nGrams = n - k + 1
    var bk = 1L
    var j = 1
    while (j < k) { bk *= B; j += 1 }
    val hashes = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + text.charAt(i); i += 1 }
    hashes(0) = h
    i = k
    while (i < n) {
      h = (h - text.charAt(i - k) * bk) * B + text.charAt(i)
      hashes(i - k + 1) = h
      i += 1
    }
    if (nGrams <= w) {
      var best = hashes(0); var bestPos = 0; i = 1
      while (i < nGrams) {
        if (java.lang.Long.compareUnsigned(hashes(i), best) <= 0) {
          best = hashes(i); bestPos = i
        }
        i += 1
      }
      return Array(((bestPos + 1).toLong, best))
    }
    val picked = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
    var start = 0
    while (start + w <= nGrams) {
      var minPos = start
      i = start + 1
      while (i < start + w) {
        if (java.lang.Long.compareUnsigned(hashes(i), hashes(minPos)) <= 0) minPos = i
        i += 1
      }
      if (!picked.contains(minPos)) picked.put(minPos, hashes(minPos))
      start += 1
    }
    picked.toArray.map { case (p, v) => ((p + 1).toLong, v) }.sortBy(_._1)
  }

  /** Compiled UDF: text -> array of (pos, hash) anchor structs. */
  def anchorUdf(k: Int, w: Int): UserDefinedFunction =
    udf((text: String) => anchors(text, k, w))
}
