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
  /** Salt choice, deliberately layered: a row-content hash alone is
    * fully deterministic but collapses for IDENTICAL rows (a key-only
    * projection of a hot key gets one salt — no spread); a partition-id
    * salt collapses on clustered/single-file data; so the salt mixes the
    * content hash with monotonically_increasing_id, which spreads every
    * row. mono_id makes the stage INDETERMINATE to the scheduler, which
    * is exactly the engine-level guarantee needed: on a task retry Spark
    * rolls back and recomputes dependent stages rather than mixing
    * outputs salted two different ways (the re-aggregation result is
    * salt-independent anyway). */
  private def salt(allCols: Seq[Column], saltBuckets: Int): Column =
    pmod(hash(allCols :+ monotonically_increasing_id(): _*), lit(saltBuckets))

  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int): DataFrame =
    df.withColumn("__salt", salt(df.columns.map(col), saltBuckets))
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
      salt(fact.columns.map(col), saltBuckets))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
