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
    * (`Main.java:189-202` retry-append): every 10th block appears twice. */
  def withDuplicates(blocks: DataFrame): DataFrame =
    blocks.unionAll(blocks.filter(col("block_id") % 10 === 0))
}
