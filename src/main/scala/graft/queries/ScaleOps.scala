package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Exact._
import graft.ops.{Bucketing, Skew}

/** Wave 5 — scale patterns exercised as first-class queries: the
  * results must equal their unsalted/unbucketed formulations (that IS
  * the oracle), while the physical plans differ (see PLANS.md).
  */
object ScaleOps {

  /** Two-phase salted aggregation == plain GROUP BY count. */
  val skewSaltedAgg: Q = Q(
    "q_skew_salted_agg",
    """SELECT o_custkey AS key, COUNT(*) AS n
      |FROM orders GROUP BY o_custkey ORDER BY key""".stripMargin) { (s, d) =>
    Skew.saltedCount(Tables.load(s, d, "orders"), col("o_custkey"), saltBuckets = 8)
      .orderBy("key")
  }

  /** Salted fact-dim join == plain join (same rows, skew-proof plan). */
  val skewSaltedJoin: Q = Q(
    "q_skew_salted_join",
    """SELECT n_name, COUNT(*) AS n_supps,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    Skew.saltedJoin(
      Tables.load(s, d, "supplier"),
      Tables.load(s, d, "nation").withColumnRenamed("n_nationkey", "s_nationkey"),
      "s_nationkey", saltBuckets = 4)
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_supps"), dsum(col("s_acctbal")).as("total_bal"))
      .orderBy("n_name")
  }

  /** Co-located bucketed join == plain join; the bucketed plan has no
    * shuffle exchange for the join itself (asserted in ScaleOpsSpec;
    * visible in PLANS.md). The bucketed tables are written once per
    * (JVM, input dir) — bucketing is a warehouse-build cost, not a
    * per-query one — so repeated invocations time only the join. */
  val joinBucketed: Q = Q(
    "q_join_bucketed",
    """SELECT o_orderkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Bucketing.ensureBucketed(
      Tables.load(s, d, "orders").select("o_orderkey"),
      "graft_b_orders", "o_orderkey", buckets = 8, sourceToken = d)
    Bucketing.ensureBucketed(
      Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "graft_b_lineitem", "o_orderkey", buckets = 8, sourceToken = d)
    Bucketing.colocatedJoin(s, "graft_b_orders", "graft_b_lineitem", "o_orderkey")
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderkey")
  }

  val all: Seq[Q] = Seq(skewSaltedAgg, skewSaltedJoin, joinBucketed)
}
