package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 43 — coverage and rank-concordance analytics: sweep-line
  * interval-union coverage per supplier, distributed Spearman rank
  * correlation over the customer population, and Kendall tau-a over
  * the nation dictionary. Exact integers throughout.
  */
object Wave43 {

  /** Interval-union coverage: each lineitem is a shipping engagement
    * [shipdate, shipdate + quantity days); per supplier, report the
    * number of intervals, the number of disjoint busy segments, the
    * union length in days (double-counted overlap excised by the
    * classic sweep), and the first-to-last span.
    *
    * Sweep-line as one window: order intervals by start within the
    * supplier, take the running MAX(end) over all PRECEDING rows; a
    * row starts a new segment iff its start clears that max, and
    * contributes max(0, end - max(start, prev_max)) covered days —
    * both order-invariant given the start-ascending sort.
    *
    * Shape at 100TB: one supplier-keyed window then one aggregate on
    * the same key — a single shuffle, no self-join (the naive
    * interval-merge is a range self-join; the sweep is linear).
    */
  val intervalUnion: Q = Q(
    "q_interval_union_len",
    """WITH iv AS (SELECT l_suppkey AS sk,
      |    epoch_ms(l_shipdate) // 86400000 AS s,
      |    epoch_ms(l_shipdate) // 86400000 + CAST(l_quantity AS BIGINT)
      |      AS e,
      |    l_orderkey AS ok, l_linenumber AS ln
      |  FROM lineitem),
      |sw AS (SELECT sk, s, e,
      |    MAX(e) OVER (PARTITION BY sk ORDER BY s, e, ok, ln
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv)
      |SELECT sk AS suppkey,
      |  CAST(COUNT(*) AS BIGINT) AS n_intervals,
      |  CAST(SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_segments,
      |  CAST(SUM(CASE WHEN pmax IS NULL THEN e - s
      |    ELSE GREATEST(e - GREATEST(s, pmax), 0) END) AS BIGINT)
      |    AS covered_days,
      |  CAST(MAX(e) - MIN(s) AS BIGINT) AS span_days
      |FROM sw GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val iv = Tables.load(s, d, "lineitem").select(
      col("l_suppkey").as("sk"),
      expr("unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000")
        .as("s"),
      (expr("unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000") +
        col("l_quantity").cast("long")).as("e"),
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val w = Window.partitionBy("sk")
      .orderBy(col("s"), col("e"), col("ok"), col("ln"))
      .rowsBetween(Window.unboundedPreceding, -1)
    iv.withColumn("pmax", max("e").over(w))
      .groupBy(col("sk").as("suppkey"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(when(col("pmax").isNull || col("s") > col("pmax"), 1L)
          .otherwise(0L)).as("n_segments"),
        sum(when(col("pmax").isNull, col("e") - col("s"))
          .otherwise(greatest(col("e") - greatest(col("s"), col("pmax")),
            lit(0L)))).as("covered_days"),
        (max("e") - min("s")).as("span_days"))
      .orderBy("suppkey")
  }

  /** Spearman rank correlation between customer lifetime spend and
    * order count, in ppm. Ranks are made total by the customer key on
    * BOTH axes (a deterministic metric definition — no average-rank
    * tie convention to disagree on); rho = 1 - 6*sum(d^2)/(n(n^2-1))
    * in truncating ppm with a DECIMAL(38) numerator (6e6 * n^3/3
    * clears BIGINT past ~100k customers).
    *
    * Shape at 100TB: the two global ranks run as
    * [[graft.ops.RankedPrefix]] two-phase prefix sums — per-bucket
    * local windows shifted by driver-prefixed bucket bases — never a
    * single-partition global window. The order-count axis buckets by
    * the count value itself (ties colocate; documented skew bounded
    * by the max order count, a dictionary-scale value).
    */
  val spearman: Q = Q(
    "q_spearman_corr",
    """WITH cu AS (SELECT o_custkey AS ck,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1),
      |r AS (SELECT ck,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cents, ck) AS BIGINT) AS rx,
      |    CAST(ROW_NUMBER() OVER (ORDER BY n_orders, ck) AS BIGINT) AS ry
      |  FROM cu)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
      |  CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
      |  CAST(1000000 - CAST(SUM((rx - ry) * (rx - ry)) AS HUGEINT)
      |      * 6000000
      |      // (CAST(COUNT(*) AS HUGEINT)
      |         * (COUNT(*) * COUNT(*) - 1))
      |    AS BIGINT) AS rho_ppm
      |FROM r""".stripMargin) { (s, d) =>
    import graft.ops.RankedPrefix
    val cu = Tables.load(s, d, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"), count(lit(1)).as("n_orders"))
    val rx = RankedPrefix.rankedCumsum(
      cu, RankedPrefix.logBucket(col("cents")), bucketDesc = false,
      order = Seq(col("cents"), col("ck")), rankCol = Some("rx")).df
    val rxy = RankedPrefix.rankedCumsum(
      rx, RankedPrefix.rangeBucket(col("n_orders"), 1L),
      bucketDesc = false,
      order = Seq(col("n_orders"), col("ck")), rankCol = Some("ry")).df
    rxy.agg(count(lit(1)).as("n_cust"),
        sum(expr("(rx - ry) * (rx - ry)")).as("sum_d2"))
      .select(col("n_cust"), col("sum_d2"),
        expr("""CAST(1000000 - CAST(sum_d2 AS DECIMAL(38,0)) * 6000000
               |  div (CAST(n_cust AS DECIMAL(38,0))
               |       * (n_cust * n_cust - 1)) AS BIGINT)"""
          .stripMargin).as("rho_ppm"))
  }

  /** Kendall tau-a concordance between nation revenue and nation
    * order volume: all nation pairs classified concordant /
    * discordant / tied by the sign of the cross-difference product.
    *
    * Shape at 100TB: one fact aggregate to the 25-row nation
    * dictionary (nation broadcast pinned; customer un-hinted into the fact
    * scan), then a broadcast self-join over dictionary pairs —
    * the O(n^2) lives entirely in dictionary space.
    */
  val kendall: Q = Q(
    "q_kendall_tau",
    """WITH na AS (SELECT c.c_nationkey AS nk,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS cents,
      |    CAST(COUNT(*) AS BIGINT) AS n_ord
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1),
      |p AS (SELECT
      |    CASE WHEN (a.cents - b.cents) * (a.n_ord - b.n_ord) > 0
      |      THEN 1 ELSE 0 END AS conc,
      |    CASE WHEN (a.cents - b.cents) * (a.n_ord - b.n_ord) < 0
      |      THEN 1 ELSE 0 END AS disc,
      |    CASE WHEN a.cents = b.cents OR a.n_ord = b.n_ord
      |      THEN 1 ELSE 0 END AS tie
      |  FROM na a JOIN na b ON a.nk < b.nk),
      |ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    CAST(SUM(conc) AS BIGINT) AS concordant,
      |    CAST(SUM(disc) AS BIGINT) AS discordant,
      |    CAST(SUM(tie) AS BIGINT) AS tied
      |  FROM p)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM na) AS n_nations,
      |  n_pairs, concordant, discordant, tied,
      |  (concordant - discordant) * 1000000 // n_pairs AS tau_ppm
      |FROM ag ORDER BY n_pairs""".stripMargin) { (s, d) =>
    val na = Tables.load(s, d, "orders")
      .join(Tables.load(s, d, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nk"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"), count(lit(1)).as("n_ord"))
    val a = na.select(col("nk").as("ank"), col("cents").as("ac"),
      col("n_ord").as("ao"))
    val b = na.select(col("nk").as("bnk"), col("cents").as("bc"),
      col("n_ord").as("bo"))
    val cross = expr("(ac - bc) * (ao - bo)")
    val ag = a.join(broadcast(b), col("ank") < col("bnk"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(cross > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(cross < 0, 1L).otherwise(0L)).as("discordant"),
        sum(when(col("ac") === col("bc") || col("ao") === col("bo"), 1L)
          .otherwise(0L)).as("tied"))
    val nn = na.agg(count(lit(1)).as("n_nations"))
    ag.crossJoin(broadcast(nn))
      .select(col("n_nations"), col("n_pairs"), col("concordant"),
        col("discordant"), col("tied"),
        expr("(concordant - discordant) * 1000000 div n_pairs")
          .as("tau_ppm"))
  }

  val all: Seq[Q] = Seq(intervalUnion, spearman, kendall)
}
