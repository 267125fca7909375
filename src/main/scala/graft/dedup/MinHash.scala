package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (shingle -> minhash signature
  * -> band -> bucket-join), the standard web-scale text dedup pipeline
  * (Broder 1997, "On the resemblance and containment of documents";
  * banding analysis per Leskovec/Rajaraman/Ullman, MMDS ch. 3).
  *
  * Scale design: candidate generation is an equi-join on (band, bandKey)
  * — a plain hash shuffle, no pairwise cross-product. With b bands of r
  * rows, a pair at Jaccard j collides with prob 1-(1-j^r)^b; verification
  * of the (small) candidate set computes exact Jaccard. All hashing is
  * xxhash64 (codegen'd native Catalyst expression, no UDFs).
  */
object MinHash {

  /** k-hash minhash signature of a shingle array column. */
  def signature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles, s => xxhash64(i, s))))

  /** Band keys: array<struct<band:int, key:bigint>>; key hashes the
    * band's slice of the signature. */
  def bandKeys(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(concat_ws(",", transform(
          slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          v => v.cast("string")))).as("key")))

  /** Candidate near-dup id pairs (idA < idB) from banded signatures.
    * `df` must carry `id` and a shingle array column `shCol`. */
  def candidatePairs(df: DataFrame, id: String, shCol: String,
      k: Int = 8, numBands: Int = 4): DataFrame = {
    require(k % numBands == 0,
      s"k=$k must be divisible by numBands=$numBands or trailing hashes are never banded")
    val rows = k / numBands
    val banded = df
      .select(col(id).as("__id"),
        explode(bandKeys(signature(col(shCol), k), numBands, rows)).as("bk"))
      .select(col("__id"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("__id").as("id_a"), col("band"), col("key"))
    val b = banded.select(col("__id").as("id_b"), col("band"), col("key"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }
}
