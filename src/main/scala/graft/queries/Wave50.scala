package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 50 — inventory decisions under constraints: the greedy
  * density-ordered knapsack stocking plan (budget = a quarter of the
  * total shelf size, self-scaling) and newsvendor critical-fractile
  * order quantities via rank-selected order statistics.
  */
object Wave50 {

  /** Greedy knapsack: parts ranked by value density (revenue cents
    * per size unit, milli precision), taken while the running shelf
    * budget — one quarter of the total size — holds. The classic
    * 1/2-approximation order, reported as the full ranked table with
    * the chosen prefix flagged.
    *
    * Shape at 100TB: the density-descending global rank and running
    * weight ride one [[graft.ops.RankedPrefix]] two-phase pass; the
    * budget is a one-row aggregate broadcast onto the ranked frame.
    */
  val knapsackGreedy: Q = Q(
    "q_knapsack_greedy",
    """WITH v AS (SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS value_c
      |  FROM lineitem GROUP BY 1),
      |it AS (SELECT v.pk, v.value_c, CAST(p.p_size AS BIGINT) AS w,
      |    v.value_c * 1000 // p.p_size AS density_milli
      |  FROM v JOIN part p ON p.p_partkey = v.pk),
      |b AS (SELECT CAST(SUM(w) AS BIGINT) // 4 AS budget FROM it),
      |r AS (SELECT pk, value_c, w, density_milli,
      |    CAST(ROW_NUMBER() OVER o AS BIGINT) AS rk,
      |    CAST(SUM(w) OVER o AS BIGINT) AS cum_w
      |  FROM it WINDOW o AS (ORDER BY density_milli DESC, pk
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT r.pk AS partkey, r.value_c, r.w, r.density_milli, r.rk,
      |  r.cum_w, b.budget,
      |  CASE WHEN r.cum_w <= b.budget THEN 1 ELSE 0 END AS chosen
      |FROM r, b ORDER BY r.rk""".stripMargin) { (s, d) =>
    import graft.ops.RankedPrefix
    val it = Tables.load(s, d, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"))
        .as("value_c"))
      .join(Tables.load(s, d, "part"),
        col("p_partkey") === col("pk"))
      .select(col("pk"), col("value_c"),
        col("p_size").cast("long").as("w"),
        expr("value_c * 1000 div p_size").as("density_milli"))
    val ranked = RankedPrefix.rankedCumsum(
      it, RankedPrefix.logBucket(col("density_milli")), bucketDesc = true,
      order = Seq(col("density_milli").desc, col("pk")),
      sums = Seq("w" -> "cum_w"), rankCol = Some("rk"))
    val budget = ranked.totals("w") / 4
    ranked.df
      .select(col("pk").as("partkey"), col("value_c"), col("w"),
        col("density_milli"), col("rk"), col("cum_w"),
        lit(budget).as("budget"),
        when(col("cum_w") <= budget, 1L).otherwise(0L).as("chosen"))
      .orderBy("rk")
  }

  /** Newsvendor order quantities: per part, the critical-fractile
    * (3:1 underage:overage → 75%) and median daily-demand order
    * statistics, rank-SELECTED from the observed (part, day) demand
    * distribution — the cross-engine-safe percentile (no
    * interpolation convention).
    *
    * Shape at 100TB: one (part, day) aggregate, then part-partitioned
    * rank windows — a single shuffle on the part key.
    */
  val newsvendor: Q = Q(
    "q_newsvendor_qty",
    """WITH pd AS (SELECT l_partkey AS pk,
      |    epoch_ms(l_shipdate) // 86400000 AS day,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS dem
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT pk, dem,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY pk ORDER BY dem, day)
      |      AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY pk) AS BIGINT) AS n
      |  FROM pd)
      |SELECT pk AS partkey, MAX(n) AS n_days,
      |  MAX(CASE WHEN rn = (n + 1) // 2 THEN dem END) AS q_median,
      |  MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN dem END) AS q_star75
      |FROM r GROUP BY pk ORDER BY pk""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val pd = Tables.load(s, d, "lineitem")
      .groupBy(col("l_partkey").as("pk"),
        expr("unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000")
          .as("day"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("dem"))
    val byPk = Window.partitionBy("pk")
    val r = pd
      .withColumn("rn",
        row_number().over(byPk.orderBy(col("dem"), col("day"))).cast("long"))
      .withColumn("n", count(lit(1)).over(byPk))
    r.groupBy(col("pk").as("partkey"))
      .agg(max("n").as("n_days"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("dem")))
          .as("q_median"),
        max(when(col("rn") === expr("(3 * n + 3) div 4"), col("dem")))
          .as("q_star75"))
      .orderBy("partkey")
  }

  val all: Seq[Q] = Seq(knapsackGreedy, newsvendor)
}
