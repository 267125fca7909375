package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomFilter

/** Structural guarantees of the deterministic Bloom filter:
  *
  *  - no false negatives, ever (every inserted key probes true)
  *  - false-positive rate near the analytic bound for the sizing
  *  - merge (bitwise OR) equals a single-pass build for any split,
  *    which is what Spark's partial-aggregation contract requires
  */
class BloomFilterSpec extends AnyFunSuite {

  private val agg = BloomFilter.Agg(numBits = 1 << 13, numHashes = 4)

  private def build(keys: Seq[Long]): Array[Long] =
    keys.foldLeft(agg.zero)(agg.reduce)

  private val members = (0L until 500L).map(i => BloomFilter.mix(i))

  test("no false negatives") {
    val bf = build(members)
    members.foreach { k =>
      assert(BloomFilter.mightContain(bf, 4, k), s"false negative for $k")
    }
  }

  test("false-positive rate near the analytic bound") {
    val bf = build(members)
    val probes = (1L to 20000L).map(i => BloomFilter.mix(-i))
      .filterNot(members.toSet)
    val fp = probes.count(BloomFilter.mightContain(bf, 4, _))
    // m=8192, n=500, k=4 → (1 - e^{-kn/m})^k ≈ 0.14% ; allow 5x slack
    val rate = fp.toDouble / probes.size
    assert(rate < 0.007, s"fp rate $rate too high for m=8192 n=500 k=4")
  }

  test("merge of split builds equals single-pass build (any split)") {
    val whole = build(members)
    Seq(1, 137, 250, 499).foreach { cut =>
      val (a, b) = members.splitAt(cut)
      val merged = agg.merge(build(a), build(b))
      assert(merged.sameElements(whole), s"merge at $cut diverged")
    }
  }

  test("empty filter rejects everything") {
    val empty = agg.zero
    assert(members.forall(!BloomFilter.mightContain(empty, 4, _)))
  }

  test("codegen expression probe agrees with the Seq probe on every key") {
    val spark = SharedSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bf = build(members)
    val keys = members.take(100) ++ (1L to 2000L).map(i => BloomFilter.mix(-i))
    val got = keys.toDF("k")
      .withColumn("bf", typedLit(bf))
      .select(col("k"),
        call_function("graft_bloom_might_contain", col("bf"), col("k")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    keys.foreach { k =>
      assert(got(k) == BloomFilter.mightContain(bf, 4, k), s"diverged on $k")
    }
    // and the inserted prefix is all-true (no false negatives via codegen)
    assert(members.take(100).forall(got(_)))
  }

  test("3-arg probe matches a filter built with k != 4 (no false negatives)") {
    val spark = SharedSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val agg6 = BloomFilter.Agg(numBits = 1 << 13, numHashes = 6)
    val bf6 = members.foldLeft(agg6.zero)(agg6.reduce)
    val hits = members.take(200).toDF("k")
      .withColumn("bf", typedLit(bf6))
      .select(call_function("graft_bloom_might_contain",
        col("bf"), col("k"), lit(6)).as("hit"))
      .collect().map(_.getBoolean(0))
    assert(hits.forall(identity),
      "k=6 filter probed with k=6 must have no false negatives")
    // the old silent trap: probing the k=6 filter with the default k=4
    // need not agree with the k=6 probe — the 3rd arg exists so callers
    // can say which filter they built; here we only pin that the typed
    // Seq probe and the SQL 3-arg probe agree on every key
    val seqHits = members.take(200).map(BloomFilter.mightContain(bf6, 6, _))
    assert(seqHits.forall(identity))
  }
}
