package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder}

/** Deterministic Bloom filter as a typed Aggregator — the explicit form
  * of Spark's own runtime-filter pattern (Catalyst's InjectRuntimeFilter
  * builds exactly this shape: aggregate the join keys of the selective
  * side into a bloom, broadcast it, and pre-filter the fact scan before
  * the shuffle). At 100TB the win is that the fact side's shuffle input
  * shrinks by the dim selectivity BEFORE any exchange; the exact join
  * that follows only has to clean up the false positives.
  *
  * Everything is deterministic (SplitMix64 double hashing, fixed seed),
  * so the filter is identical across retries, partitionings, and merge
  * orders — bitwise-OR merge is associative and commutative, which is
  * Spark's partial-aggregation contract.
  */
object BloomFilter {

  /** SplitMix64 finalizer (Steele, Lea & Flood 2014; public domain). */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Kirsch–Mitzenmacher double hashing: bit_i = (h1 + i·h2) mod m
    * gives k independent-enough probes from two hash evaluations. */
  private def bit(key: Long, i: Int, numBits: Int): Int = {
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    (((h1 + i.toLong * h2) & Long.MaxValue) % numBits).toInt
  }

  final case class Agg(numBits: Int, numHashes: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits > 0 && numBits % 64 == 0, "numBits must be a multiple of 64")
    require(numHashes >= 1)

    def zero: Array[Long] = new Array[Long](numBits / 64)

    def reduce(b: Array[Long], key: Long): Array[Long] = {
      var i = 0
      while (i < numHashes) {
        val p = bit(key, i, numBits)
        b(p >>> 6) |= 1L << (p & 63)
        i += 1
      }
      b
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    def finish(b: Array[Long]): Array[Long] = b

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Column form: `dim.agg(BloomFilter.agg(col("key")))` → one
    * array<bigint> row, small enough to broadcast. Size for the
    * expected distinct count: m ≈ 10·n bits keeps fp under ~1%
    * at k = 4.
    *
    * COUPLING: probes must use the SAME `numHashes` — pass it as the
    * third argument of `graft_bloom_might_contain(words, key, k)`
    * whenever it differs from the shared default 4
    * ([[graft.plans.BloomMightContain.NumHashes]]); a mismatched k
    * yields false NEGATIVES (wrongly pruned rows), not just extra
    * false positives. */
  def agg(keyCol: Column, numBits: Int = 1 << 13, numHashes: Int = 4): Column =
    udaf(Agg(numBits, numHashes)).apply(keyCol)

  /** Probe. Takes the array column's Seq directly (O(1) indexed for
    * Spark's ArraySeq) — no per-row copy of the filter words. */
  def mightContain(words: scala.collection.Seq[Long], numHashes: Int, key: Long): Boolean = {
    val numBits = words.length * 64
    var i = 0
    while (i < numHashes) {
      val p = bit(key, i, numBits)
      if ((words(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Probe over Catalyst [[ArrayData]] in place — the codegen kernel
    * behind [[graft.plans.BloomMightContain]] (called from generated
    * code via this object's static forwarder; no boxing, no copy). */
  def mightContainArray(
      words: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int, key: Long): Boolean = {
    val numBits = words.numElements() * 64
    var i = 0
    while (i < numHashes) {
      val p = bit(key, i, numBits)
      if ((words.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
