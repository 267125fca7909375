package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Nest

/** Builds the nested "blocks" analog of the reference data model from the
  * driver's star schema: orders are blocks, lineitems are transactions.
  *
  *   block  ~ AvroBitcoinBlock  (`BQRow.avsc:38-50`)
  *   txs[]  ~ transactions array (`BitcoinBlockHandler.java:103-109`)
  *
  * Conventions preserved from the reference:
  *  - childless parents get an EMPTY array, never null
  *    (`BitcoinBlockHandler.java:103-104`);
  *  - timestamps are epoch-millis stored as plain long
  *    (`BitcoinBlockHandler.java:90`, `BigquerySchema.java:52`);
  *  - arrays are sorted on a leading unique key so downstream results
  *    are deterministic (collect_list order is shuffle-dependent).
  */
object Blocks {

  /** Nested blocks: one row per order with a sorted transactions array. */
  def nested(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    val header = orders.select(
      col("o_orderkey").as("block_id"),
      graft.functions.Exact.ms(col("o_orderdate")).as("ts_ms"),
      col("o_custkey"),
      col("o_orderstatus"),
      col("o_totalprice"),
      col("o_orderpriority"))
    val tx = struct(
      col("l_linenumber"), // leading unique key => deterministic sort
      col("l_partkey"), col("l_suppkey"),
      col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
    Nest.nest(header, lineitem, col("block_id"), col("l_orderkey"), tx,
      as = "transactions")
  }

  /** Simulates the reference's at-least-once duplicate rows
    * (`Main.java:189-202` retry-append): every 10th block appears twice.
    * Duplication is a single narrow explode (1 or 2 copies per row) —
    * a self-union would re-derive the whole nest subplan for the
    * duplicated slice and break the join's output partitioning, forcing
    * the downstream dedup window to re-shuffle. */
  def withDuplicates(blocks: DataFrame): DataFrame =
    blocks
      .withColumn("__copy",
        explode(when(col("block_id") % 10 === 0, array(lit(1), lit(2)))
          .otherwise(array(lit(1)))))
      .drop("__copy")
}
