package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ingest.Blocks
import graft.ops.{Dedup, Nest}

/** Wave 2a — the reference's signature pipeline shapes: nest/flatten,
  * window dedup, and the flagship end-to-end ETL (etl.sh:6-33).
  */
object Nested {

  /** The full `etl.sh` pipeline re-expressed Spark-first:
    * nest (R3) -> duplicate-inject (R8's at-least-once) -> window dedup
    * (R12-R14) -> explode (R15) -> star-project (R16, including the
    * analog of silently dropping `difficultyTarget`: o_totalprice).
    *
    * The oracle states the equivalent relational form (dedup orders then
    * join lineitem) — nest∘explode == join on a keyed child.
    */
  val flagship: Q = Q(
    "q_flagship_dedup_explode",
    """WITH dup AS (
      |  SELECT * FROM orders
      |  UNION ALL SELECT * FROM orders WHERE o_orderkey % 10 = 0),
      |dedup AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |                               ORDER BY o_orderkey) AS rn FROM dup)
      |SELECT o.o_orderkey AS block_id, epoch_ms(o.o_orderdate) AS ts_ms,
      |       o.o_custkey, o.o_orderstatus, o.o_orderpriority,
      |       l.l_linenumber, l.l_partkey, l.l_suppkey,
      |       l.l_quantity, l.l_extendedprice, l.l_returnflag
      |FROM (SELECT * FROM dedup WHERE rn = 1) o
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |ORDER BY block_id, l_linenumber, l_partkey, l_suppkey, l_extendedprice,
      |         l_quantity, l_returnflag""".stripMargin) { (s, d) =>
    val dup = Blocks.withDuplicates(Blocks.nested(s, d))
    val deduped = Dedup.keepFirst(dup, Seq(col("block_id")), Seq(col("block_id")))
    Nest.flattenInner(deduped, "transactions", "tx")
      .select(
        col("block_id"), col("ts_ms"),
        col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"),
        col("tx.l_linenumber"), col("tx.l_partkey"), col("tx.l_suppkey"),
        col("tx.l_quantity"), col("tx.l_extendedprice"), col("tx.l_returnflag"))
      .orderBy("block_id", "l_linenumber", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_quantity", "l_returnflag")
  }

  val dedupRowNumber: Q = Q(
    "q_dedup_rownum",
    """WITH dup AS (
      |  SELECT * FROM orders
      |  UNION ALL SELECT * FROM orders WHERE o_orderkey % 10 = 0)
      |SELECT o_orderkey, o_custkey, o_totalprice FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
      |                               ORDER BY o_orderkey) AS rn FROM dup)
      |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = Tables.load(s, d, "orders")
    val dup = orders.unionAll(orders.filter(col("o_orderkey") % 10 === 0))
    Dedup.keepFirst(dup, Seq(col("o_orderkey")), Seq(col("o_orderkey")))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Arbitrary-survivor dedup (the reference's exact semantics — no
    * ORDER BY at etl.sh:12). Injected duplicates are full-row identical,
    * so any survivor yields the same result. */
  val dedupDropDuplicates: Q = Q(
    "q_dedup_dropdup",
    """WITH dup AS (
      |  SELECT * FROM orders
      |  UNION ALL SELECT * FROM orders WHERE o_orderkey % 10 = 0)
      |SELECT DISTINCT o_orderkey, o_custkey, o_totalprice FROM dup
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    val orders = Tables.load(s, d, "orders")
    val dup = orders.unionAll(orders.filter(col("o_orderkey") % 10 === 0))
    Dedup.anySurvivor(dup, Seq("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** Nested blocks where only big lineitems (qty >= 45) are collected, so
    * many blocks have EMPTY transaction arrays — making inner-vs-outer
    * flatten observable (the reference's empty-array row-loss quirk,
    * SURVEY.md §1.2 / R15). */
  private def sparseBlocks(s: org.apache.spark.sql.SparkSession, d: String) = {
    val orders = Tables.load(s, d, "orders")
    val big = Tables.load(s, d, "lineitem").filter(col("l_quantity") >= 45)
    Nest.nest(
      orders.select(col("o_orderkey"), col("o_orderpriority")),
      big, col("o_orderkey"), col("l_orderkey"),
      struct(col("l_linenumber"), col("l_quantity")), as = "transactions")
  }

  val explodeInner: Q = Q(
    "q_explode_inner",
    """SELECT o_orderkey, l_linenumber, l_quantity
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_quantity >= 45
      |ORDER BY o_orderkey, l_linenumber, l_quantity""".stripMargin) { (s, d) =>
    Nest.flattenInner(sparseBlocks(s, d), "transactions", "tx")
      .select(col("o_orderkey"), col("tx.l_linenumber"), col("tx.l_quantity"))
      .orderBy("o_orderkey", "l_linenumber", "l_quantity")
  }

  val explodeOuter: Q = Q(
    "q_explode_outer",
    """SELECT o_orderkey, l_linenumber, l_quantity
      |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 45) l
      |  ON l_orderkey = o_orderkey
      |ORDER BY o_orderkey, l_linenumber ASC NULLS FIRST,
      |         l_quantity ASC NULLS FIRST""".stripMargin) { (s, d) =>
    Nest.flattenOuter(sparseBlocks(s, d), "transactions", "tx")
      .select(col("o_orderkey"), col("tx.l_linenumber"), col("tx.l_quantity"))
      .orderBy(col("o_orderkey"), col("l_linenumber").asc_nulls_first,
        col("l_quantity").asc_nulls_first)
  }

  val nestCollect: Q = Q(
    "q_nest_collect",
    """SELECT l_orderkey,
      |       array_to_string(list(l_linenumber ORDER BY l_linenumber), '|') AS line_numbers,
      |       COUNT(*) AS n_lines
      |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, d) =>
    Tables.load(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(
        concat_ws("|",
          array_sort(collect_list(col("l_linenumber"))).cast("array<string>"))
          .as("line_numbers"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_orderkey")
  }

  val all: Seq[Q] = Seq(
    flagship, dedupRowNumber, dedupDropDuplicates,
    explodeInner, explodeOuter, nestCollect)
}
