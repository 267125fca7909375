package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-partitioned parquet layout + partition pruning.
  *
  * The 100TB layout for the reference's block stream: partition the
  * warehouse by the rotation bucket (R7's `epochSec / rotationTime`,
  * `AvroWriter.java:45-49`, promoted from file naming to directory
  * partitioning), so time-range queries read only the matching
  * directories — static partition pruning does the work of a coarse
  * index. This is the "partition blocks by time bucket" north-star note
  * of SURVEY §4.2.
  */
object TimePartitioned {

  /** Write `df` partitioned by the UTC date of `tsCol`. */
  def writeByDate(df: DataFrame, tsCol: String, dest: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write
      .mode("overwrite")
      .partitionBy("p_date")
      .parquet(dest)

  /** Read back with a date-range predicate that must prune partitions. */
  def readRange(spark: SparkSession, dest: String, from: String, to: String): DataFrame =
    spark.read.parquet(dest)
      .filter(col("p_date") >= lit(from) && col("p_date") <= lit(to))

  /** True when the scan's partition filters include `p_date` bounds
    * (verification: pruning reached the source, not a post-scan filter). */
  def prunes(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("PartitionFilters") && {
      val pf = plan.split("PartitionFilters:")(1).split("]")(0)
      pf.contains("p_date")
    }
  }
}
