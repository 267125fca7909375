package graft.dedup

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Content-defined chunking (CDC): split each document at positions
  * where a rolling hash of the trailing `K` characters satisfies a
  * mask condition, so chunk boundaries follow CONTENT, not offsets —
  * an insertion or deletion only perturbs the chunks that physically
  * overlap the edit, and every later chunk re-aligns and dedups
  * against the unedited copy (LBFS, Muthitacharoen/Chen/Mazières,
  * SOSP 2001 §3.1; mask-style cut predicate per FastCDC, Xia et al.,
  * USENIX ATC 2016).
  *
  * Deliberately STATELESS cut predicate (no min/max chunk bounds):
  * whether position e is a boundary depends only on chars
  * (e-K, e], never on earlier cuts. That is what makes the operator
  * embarrassingly parallel at 100 TB — any substring can be chunked
  * without seeing its neighbors — and what makes the boundary set
  * replayable in set-oriented SQL (the DuckDB oracle enumerates
  * positions and applies the same predicate; LBFS-style expected
  * chunk size is controlled by the modulus alone).
  *
  * The rolling hash is the same base-1000003 mod-2^64 Rabin-Karp
  * chain as [[graft.text.Winnow]]; the cut test `(h & 63) == 0`
  * (expected chunk ≈ 64 chars) divides 2^64, so the oracle can test
  * the un-reduced residue sum directly.
  */
object Cdc {

  private val B = 1000003L

  /** Rolling window width (chars). */
  val K = 8

  /** Cut mask: boundary when (h & Mask) == 0; expected chunk = Mask+1. */
  val Mask = 63L

  /** 1-based char positions e (K <= e <= n-1) with a boundary AFTER
    * char e. A cut at e == n would only create an empty trailing
    * chunk, so it is excluded on both engines. */
  def cuts(text: String): Array[Int] = {
    if (text == null || text.length <= K) return Array.empty[Int]
    val n = text.length
    var bk = 1L
    var j = 1
    while (j < K) { bk *= B; j += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0
    while (i < K) { h = h * B + text.charAt(i); i += 1 }
    // h now covers chars [0, K); boundary candidate after 0-based K-1
    if ((h & Mask) == 0L && K <= n - 1) out += K
    i = K
    while (i < n - 1) { // last char can never end a usable cut
      h = (h - text.charAt(i - K) * bk) * B + text.charAt(i)
      if ((h & Mask) == 0L) out += (i + 1) // 1-based end position
      i += 1
    }
    out.toArray
  }

  /** Chunks of `text` between content-defined boundaries, in order.
    * Concatenation always reconstructs the document exactly. */
  def chunks(text: String): Array[String] = {
    if (text == null) return Array.empty[String]
    if (text.isEmpty) return Array("")
    val cs = cuts(text)
    val out = new Array[String](cs.length + 1)
    var prev = 0
    var i = 0
    while (i < cs.length) {
      out(i) = text.substring(prev, cs(i))
      prev = cs(i)
      i += 1
    }
    out(cs.length) = text.substring(prev)
    out
  }

  /** Compiled UDF: text -> ordered chunk array (one pass, no shuffle). */
  val chunkUdf: UserDefinedFunction = udf((text: String) => chunks(text))
}
