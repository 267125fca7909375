package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 57 — inequality and outlier audits: the Palma ratio of
  * customer spend (top-10% share over bottom-40% share, pure rank
  * cumsums) and Tukey-fence outlier counts per market segment
  * (rank-selected quartiles, fences compared in doubled integers —
  * no 1.5x float ever appears).
  */
object Wave57 {

  /** Palma ratio: spend of the top ceil(n/10) customers over spend of
    * the bottom floor(2n/5), in ppm — the inequality readout that
    * ignores the middle 50%. Shares of total ride along.
    *
    * Shape at 100TB: one customer aggregate; rank and running spend
    * in one [[graft.ops.RankedPrefix]] pass (no global window); the
    * two cut sums read off the cumsum at the rank cutpoints.
    */
  val palmaRatio: Q = Q(
    "q_palma_ratio",
    """WITH cu AS (SELECT o_custkey AS ck,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |r AS (SELECT ck, cents,
      |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rk,
      |    CAST(SUM(cents) OVER w AS BIGINT) AS cum,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
      |    CAST(SUM(cents) OVER () AS BIGINT) AS tot
      |  FROM cu WINDOW w AS (ORDER BY cents, ck
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |k AS (SELECT n, tot, (n + 9) // 10 AS k10, 2 * n // 5 AS k40
      |  FROM r LIMIT 1),
      |b AS (SELECT MAX(CASE WHEN rk = k.k40 THEN cum END) AS bot40,
      |    MAX(CASE WHEN rk = k.n - k.k10 THEN cum END) AS below_top
      |  FROM r, k GROUP BY k.n, k.k10, k.k40)
      |SELECT k.n AS n_cust, k.k10 AS n_top10, k.k40 AS n_bot40,
      |  k.tot - b.below_top AS top10_cents, b.bot40 AS bot40_cents,
      |  (k.tot - b.below_top) * 1000000 // k.tot AS top10_share_ppm,
      |  b.bot40 * 1000000 // k.tot AS bot40_share_ppm,
      |  CAST(CAST(k.tot - b.below_top AS HUGEINT) * 1000000 // b.bot40
      |    AS BIGINT) AS palma_ppm
      |FROM k, b ORDER BY n_cust""".stripMargin) { (s, d) =>
    import graft.ops.RankedPrefix
    val cu = Tables.load(s, d, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val ranked = RankedPrefix.rankedCumsum(
      cu, RankedPrefix.logBucket(col("cents")), bucketDesc = false,
      order = Seq(col("cents"), col("ck")),
      sums = Seq("cents" -> "cum"), rankCol = Some("rk"))
    val n = ranked.nRows
    val tot = ranked.totals("cents")
    val k10 = (n + 9) / 10
    val k40 = 2 * n / 5
    val b = ranked.df
      .agg(max(when(col("rk") === k40, col("cum"))).as("bot40"),
        max(when(col("rk") === (n - k10), col("cum"))).as("below_top"))
    b.select(lit(n).as("n_cust"), lit(k10).as("n_top10"),
        lit(k40).as("n_bot40"),
        (lit(tot) - col("below_top")).as("top10_cents"),
        col("bot40").as("bot40_cents"))
      .select(col("n_cust"), col("n_top10"), col("n_bot40"),
        col("top10_cents"), col("bot40_cents"),
        expr(s"top10_cents * 1000000 div ${tot}L").as("top10_share_ppm"),
        expr(s"bot40_cents * 1000000 div ${tot}L").as("bot40_share_ppm"),
        expr("""CAST(CAST(top10_cents AS DECIMAL(38,0)) * 1000000
               |  div bot40_cents AS BIGINT)""".stripMargin)
          .as("palma_ppm"))
  }

  /** Tukey-fence outlier audit per market segment: rank-selected
    * quartiles of customer spend, fences at q1 - 1.5*IQR and
    * q3 + 1.5*IQR compared in DOUBLED integers (2x < 5*q1 - 3*q3,
    * 2x > 5*q3 - 3*q1 — the 1.5 never becomes a float), with low /
    * high outlier counts and the fence values in half-cents.
    *
    * Shape at 100TB: one customer aggregate, one segment-partitioned
    * rank window, one re-aggregate — a single key shuffle.
    */
  val tukeyFences: Q = Q(
    "q_tukey_fences",
    """WITH cu AS (SELECT o.o_custkey AS ck, MIN(c.c_mktsegment) AS seg,
      |    CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1),
      |r AS (SELECT seg, ck, cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY seg
      |      ORDER BY cents, ck) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY seg) AS BIGINT) AS n
      |  FROM cu),
      |q AS (SELECT seg, MAX(n) AS n,
      |    MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1,
      |    MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS q3
      |  FROM r GROUP BY 1)
      |SELECT q.seg AS segment, q.n AS n_cust, q.q1, q.q3,
      |  5 * q.q1 - 3 * q.q3 AS low_fence_x2,
      |  5 * q.q3 - 3 * q.q1 AS high_fence_x2,
      |  CAST(SUM(CASE WHEN 2 * r.cents < 5 * q.q1 - 3 * q.q3
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(SUM(CASE WHEN 2 * r.cents > 5 * q.q3 - 3 * q.q1
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM r JOIN q ON q.seg = r.seg
      |GROUP BY q.seg, q.n, q.q1, q.q3 ORDER BY segment""".stripMargin) {
    (s, d) =>
    val cu = Tables.load(s, d, "orders")
      .join(Tables.load(s, d, "customer")
        .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg")),
        col("o_custkey") === col("ck"))
      .groupBy("ck")
      .agg(min("seg").as("seg"),
        sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
          .as("cents"))
    val bySeg = Window.partitionBy("seg")
    val r = cu
      .withColumn("rn", row_number()
        .over(bySeg.orderBy(col("cents"), col("ck"))).cast("long"))
      .withColumn("n", count(lit(1)).over(bySeg))
    val q = r.groupBy("seg")
      .agg(max("n").as("n"),
        max(when(col("rn") === expr("(n + 3) div 4"), col("cents")))
          .as("q1"),
        max(when(col("rn") === expr("(3 * n + 3) div 4"), col("cents")))
          .as("q3"))
    r.join(broadcast(q.select(col("seg"), col("n").as("qn"),
        col("q1"), col("q3"))), Seq("seg"))
      .groupBy(col("seg").as("segment"), col("qn").as("n_cust"),
        col("q1"), col("q3"))
      .agg(
        sum(when(expr("2 * cents < 5 * q1 - 3 * q3"), 1L).otherwise(0L))
          .as("n_low"),
        sum(when(expr("2 * cents > 5 * q3 - 3 * q1"), 1L).otherwise(0L))
          .as("n_high"))
      .select(col("segment"), col("n_cust"), col("q1"), col("q3"),
        expr("5 * q1 - 3 * q3").as("low_fence_x2"),
        expr("5 * q3 - 3 * q1").as("high_fence_x2"),
        col("n_low"), col("n_high"))
      .orderBy("segment")
  }

  val all: Seq[Q] = Seq(palmaRatio, tukeyFences)
}
