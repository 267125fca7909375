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
    // hash(key, partition id) is retry-deterministic (a re-executed task
    // re-reads the same split); monotonically_increasing_id is not —
    // salt values would shift under task retry.
    df.withColumn("__salt", pmod(hash(key, spark_partition_id()), lit(saltBuckets)))
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
      pmod(hash(col(key), spark_partition_id()), lit(saltBuckets)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
