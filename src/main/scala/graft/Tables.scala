package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All schemas are fixed by the driver; we never use `inferSchema`
  * (mirrors the reference's compile-time Avro codegen stance,
  * `bitcoin_blocks/src/main/avro/com/google/BlockToBq/BQRow.avsc:1-51`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS); Spark reads it (only) as a
    // nanos long via spark.sql.legacy.parquet.nanosAsLong. Convert back
    // to a microsecond TIMESTAMP: ns -> us floor-division composes with
    // any later ms truncation identically to DuckDB's direct ns -> ms.
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (for the few SQL-expressed ops
    * like GROUPING SETS that have no stable public DataFrame API). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
