package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate fingerprinting: a 64-bit signature whose
  * Hamming distance approximates feature-set similarity (Charikar 2002,
  * "Similarity estimation techniques from rounding algorithms"; the
  * quarter-blocking search is Manku/Jain/Sarma, WWW 2007).
  *
  * The token hash is the first 64 bits of MD5 (bit b = bit (7-b%8) of
  * digest byte b/8 — i.e. the md5 HEX string read left-to-right, each
  * hex digit MSB-first). MD5 exists in every engine, so the whole
  * signature chain — token hash, ±1 bit voting, sign threshold — is
  * replayable as SQL and the q_dedup_simhash oracle hash-matches; a
  * murmur3 kernel (the previous form) had no DuckDB equivalent and
  * left this operator rows-only.
  *
  * The per-document kernel is imperative bit-twiddling, so it runs as a
  * typed map (Dataset), not a SQL expression; pair search is relational:
  * block on 16-bit quarters (pigeonhole: hamming <= 3 implies at least
  * one of 4 quarters identical), equi-join on (quarter index, quarter
  * value), then verify with `bit_count(a ^ b)` — no cross-product.
  */
object SimHash {

  /** 64-bit simhash of a token multiset (deterministic, engine-
    * portable: every token's vote replays in SQL from md5 hex). */
  def simhash64(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    tokens.foreach { t =>
      val d = md.digest(t.getBytes("UTF-8")) // digest() resets the instance
      var b = 0
      while (b < 64) {
        if (((d(b >> 3) >> (7 - (b & 7))) & 1) == 1) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Computes (id, simhash) PAIRS from an array-of-string column — the
    * result carries ONLY those two columns (join back on `id` to
    * enrich); `id` must be numeric (cast to long). */
  def withSimhash(spark: SparkSession, df: DataFrame, id: String,
      toksCol: String): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Long)] = df
      .select(col(id).cast("long"), col(toksCol))
      .as[(Long, Seq[String])]
      .map { case (i, ts) => (i, simhash64(ts)) }
    pairs.toDF(id, "simhash")
  }

  /** Near-dup id pairs with Hamming distance <= maxDist (<= 16 bits of
    * the 4-quarter blocking guarantee holds for maxDist <= 3). */
  def nearPairs(sim: DataFrame, id: String, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-quarter blocking only guarantees recall for maxDist <= 3")
    val quartered = sim.select(
      col(id).as("__id"), col("simhash"),
      explode(sequence(lit(0), lit(3))).as("q"))
      .withColumn("qval",
        expr("shiftrightunsigned(simhash, CAST(q * 16 AS INT)) & 65535"))
    val a = quartered.select(col("__id").as("id_a"), col("simhash").as("sh_a"),
      col("q"), col("qval"))
    val b = quartered.select(col("__id").as("id_b"), col("simhash").as("sh_b"),
      col("q"), col("qval"))
    a.join(b, Seq("q", "qval")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
