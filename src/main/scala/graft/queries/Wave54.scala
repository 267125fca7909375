package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 54 — operational risk readouts: shipping-latency SLA
  * percentiles per order priority (rank-selected order statistics)
  * and the returns odds-ratio per brand (2x2 association in exact
  * cross-multiplied integers).
  */
object Wave54 {

  private val SlaDays = 30L

  /** Shipping SLA: days from order to line shipment, per order
    * priority — p50/p90/p99 rank-SELECTED (the cross-engine-safe
    * percentile), mean in milli (truncating), and the share of lines
    * breaching the $SlaDays-day SLA in ppm.
    *
    * Shape at 100TB: one un-hinted dim join (orders' date+priority
    * onto lineitem — at scale both fact-sized, a bucketed co-located
    * join), one priority-partitioned rank window, one aggregate.
    */
  val slaShipping: Q = Q(
    "q_sla_shipping",
    s"""WITH d AS (SELECT o.o_orderpriority AS pri,
       |    (epoch_ms(l.l_shipdate) - epoch_ms(o.o_orderdate)) // 86400000
       |      AS lag_d,
       |    l.l_orderkey AS ok, l.l_linenumber AS ln
       |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
       |r AS (SELECT pri, lag_d,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY pri
       |      ORDER BY lag_d, ok, ln) AS BIGINT) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY pri) AS BIGINT) AS n
       |  FROM d)
       |SELECT pri AS priority, MAX(n) AS n_lines,
       |  CAST(SUM(lag_d) * 1000 // MAX(n) AS BIGINT) AS mean_milli,
       |  MAX(CASE WHEN rn = (n + 1) // 2 THEN lag_d END) AS p50,
       |  MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_d END) AS p90,
       |  MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN lag_d END) AS p99,
       |  CAST(SUM(CASE WHEN lag_d > $SlaDays THEN 1 ELSE 0 END) * 1000000
       |    // MAX(n) AS BIGINT) AS breach_ppm
       |FROM r GROUP BY pri ORDER BY priority""".stripMargin) { (s, d) =>
    val dd = Tables.load(s, d, "lineitem")
      .join(Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority").as("pri"),
          col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("pri"),
        expr("""(unix_millis(CAST(l_shipdate AS TIMESTAMP))
               | - unix_millis(CAST(o_orderdate AS TIMESTAMP)))
               | div 86400000""".stripMargin).as("lag_d"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val byPri = Window.partitionBy("pri")
    val r = dd
      .withColumn("rn", row_number()
        .over(byPri.orderBy(col("lag_d"), col("ok"), col("ln")))
        .cast("long"))
      .withColumn("n", count(lit(1)).over(byPri))
    r.groupBy(col("pri").as("priority"))
      .agg(max("n").as("n_lines"),
        expr("CAST(SUM(lag_d) * 1000 div MAX(n) AS BIGINT)")
          .as("mean_milli"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("lag_d")))
          .as("p50"),
        max(when(col("rn") === expr("(9 * n + 9) div 10"), col("lag_d")))
          .as("p90"),
        max(when(col("rn") === expr("(99 * n + 99) div 100"),
          col("lag_d"))).as("p99"),
        expr(s"""CAST(SUM(CASE WHEN lag_d > $SlaDays THEN 1 ELSE 0 END)
                | * 1000000 div MAX(n) AS BIGINT)""".stripMargin)
          .as("breach_ppm"))
      .orderBy("priority")
  }

  /** Returns odds ratio per brand: the 2x2 table (this brand vs all
    * others) x (returned vs kept), with the odds ratio cross-
    * multiplied exact — or_ppm = a*d*1e6 // (b*c) — and the sign of
    * the log-odds as the direction flag. The brand-level "is this
    * brand returned disproportionately often" screen next to
    * q_chisq_independence's global test.
    *
    * Shape at 100TB: one brand-keyed aggregate; the global margins
    * re-aggregate the brand dictionary; everything after is
    * dictionary arithmetic.
    */
  val oddsRatio: Q = Q(
    "q_odds_ratio",
    """WITH m AS (SELECT p.p_brand AS brand,
      |    CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ret,
      |    CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 0 ELSE 1 END)
      |      AS BIGINT) AS kept
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1),
      |t AS (SELECT CAST(SUM(ret) AS BIGINT) AS tret,
      |    CAST(SUM(kept) AS BIGINT) AS tkept FROM m)
      |SELECT m.brand, m.ret, m.kept,
      |  t.tret - m.ret AS other_ret, t.tkept - m.kept AS other_kept,
      |  CAST(CAST(m.ret AS HUGEINT) * (t.tkept - m.kept) * 1000000
      |    // (CAST(m.kept AS HUGEINT) * (t.tret - m.ret))
      |    AS BIGINT) AS or_ppm,
      |  CAST(CASE WHEN CAST(m.ret AS HUGEINT) * (t.tkept - m.kept) >
      |    CAST(m.kept AS HUGEINT) * (t.tret - m.ret) THEN 1
      |    WHEN CAST(m.ret AS HUGEINT) * (t.tkept - m.kept) <
      |    CAST(m.kept AS HUGEINT) * (t.tret - m.ret) THEN -1
      |    ELSE 0 END AS BIGINT) AS direction
      |FROM m, t ORDER BY m.brand""".stripMargin) { (s, d) =>
    val m = Tables.load(s, d, "lineitem")
      .join(Tables.load(s, d, "part"),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
        .as("ret"),
        sum(when(col("l_returnflag") === "R", 0L).otherwise(1L))
          .as("kept"))
    val t = m.agg(sum("ret").as("tret"), sum("kept").as("tkept"))
    m.crossJoin(broadcast(t))
      .select(col("brand"), col("ret"), col("kept"),
        (col("tret") - col("ret")).as("other_ret"),
        (col("tkept") - col("kept")).as("other_kept"),
        expr("""CAST(CAST(ret AS DECIMAL(38,0)) * (tkept - kept) * 1000000
               |  div (CAST(kept AS DECIMAL(38,0)) * (tret - ret))
               |  AS BIGINT)""".stripMargin).as("or_ppm"),
        expr("""CAST(CASE WHEN CAST(ret AS DECIMAL(38,0)) * (tkept - kept)
               |  > CAST(kept AS DECIMAL(38,0)) * (tret - ret) THEN 1
               |  WHEN CAST(ret AS DECIMAL(38,0)) * (tkept - kept) <
               |  CAST(kept AS DECIMAL(38,0)) * (tret - ret) THEN -1
               |  ELSE 0 END AS BIGINT)""".stripMargin).as("direction"))
      .orderBy("brand")
  }

  val all: Seq[Q] = Seq(slaShipping, oddsRatio)
}
