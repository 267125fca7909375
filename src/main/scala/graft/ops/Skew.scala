package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted aggregation and salted joins.
  *
  * At 100TB a handful of hot keys (the reference analog: one block_id
  * re-appended thousands of times by the retry loop, `Main.java:189-202`)
  * serialize an entire stage. Salting splits a hot key across
  * `saltBuckets` reducers, then a second, tiny aggregation merges the
  * partials — the classic two-phase plan AQE's skew handling mirrors
  * for joins, expressed explicitly for aggregations.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum-style aggregates by `key`
    * where some key values are pathologically hot.
    * `aggs` must be re-aggregable (sum of partial sums etc.). */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int): DataFrame =
    // Row-content hash: retry-deterministic (unlike
    // monotonically_increasing_id, whose values shift when a task is
    // re-executed) AND spreads a hot key's rows within one scan
    // partition (unlike spark_partition_id, which collapses to a single
    // salt per key per partition — useless on clustered/sorted data).
    // Only fully-identical rows share a salt.
    df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(saltBuckets)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy("__key")
      .agg(sum(col("__partial")).as("n"))
      .withColumnRenamed("__key", "key")

  /** Salted broadcast-free join of a skewed fact side against a dim:
    * fact keys get a random salt in [0, saltBuckets); the dim side is
    * replicated saltBuckets times so every (key, salt) pair matches.
    * Turns one hot reducer into `saltBuckets` even ones. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltBuckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(saltBuckets)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
