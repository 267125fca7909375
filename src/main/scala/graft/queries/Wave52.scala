package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 52 — monotone-trend and drift detection on the daily revenue
  * series: the Mann–Kendall S test (all-pairs sign concordance over
  * the calendar-bounded day dictionary, tie-corrected variance) and
  * the Page–Hinkley cumulative-deviation drift detector. Exact
  * integers; z via the IEEE-exact integer sqrt.
  */
object Wave52 {

  /** Mann–Kendall: S = Σ_{i<j} sign(x_j - x_i) over day pairs, the
    * tie-corrected variance NUMERATOR n(n-1)(2n+5) - Σ t(t-1)(2t+5)
    * kept un-divided (the /18 rides into the z denominator as
    * sqrt(2*num)/6 — no fractional variance), and the continuity-
    * corrected z in milli.
    *
    * Shape at 100TB: one day aggregate, then an all-pairs self-join
    * strictly over the CALENDAR-BOUNDED day dictionary (n² of a
    * bounded set, broadcast) — the fact table is touched once.
    */
  val mannKendall: Q = Q(
    "q_mann_kendall",
    """WITH dr AS (SELECT epoch_ms(o_orderdate) // 86400000 AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |s AS (SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
      |      WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM dr a JOIN dr b ON b.day > a.day),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dr),
      |tg AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM dr
      |  GROUP BY x HAVING COUNT(*) > 1),
      |tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tie_groups,
      |    CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
      |      AS tie_corr
      |  FROM tg)
      |SELECT n.n AS n_days, s.s_stat, tc.n_tie_groups,
      |  n.n * (n.n - 1) * (2 * n.n + 5) - tc.tie_corr AS var_num18,
      |  (s.s_stat - CASE WHEN s.s_stat > 0 THEN 1
      |     WHEN s.s_stat < 0 THEN -1 ELSE 0 END) * 6000
      |    // CAST(FLOOR(SQRT(CAST(2 * (n.n * (n.n - 1) * (2 * n.n + 5)
      |        - tc.tie_corr) AS DOUBLE))) AS BIGINT) AS z_milli
      |FROM s, n, tc ORDER BY n_days""".stripMargin) { (s, d) =>
    val dr = Tables.load(s, d, "orders")
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
        .as("day"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("x"))
    val a = dr.select(col("day").as("da"), col("x").as("xa"))
    val b = dr.select(col("day").as("db"), col("x").as("xb"))
    val sAgg = a.join(broadcast(b), col("db") > col("da"))
      .agg(sum(when(col("xb") > col("xa"), 1L)
        .when(col("xb") < col("xa"), -1L).otherwise(0L)).as("s_stat"))
    val nAgg = dr.agg(count(lit(1)).as("n"))
    val tc = dr.groupBy("x").agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .agg(count(lit(1)).as("n_tie_groups"),
        coalesce(sum(expr("t * (t - 1) * (2 * t + 5)")), lit(0L))
          .as("tie_corr"))
    sAgg.crossJoin(broadcast(nAgg)).crossJoin(broadcast(tc))
      .select(col("n").as("n_days"), col("s_stat"), col("n_tie_groups"),
        expr("n * (n - 1) * (2 * n + 5) - tie_corr").as("var_num18"),
        expr("""(s_stat - CASE WHEN s_stat > 0 THEN 1
               |   WHEN s_stat < 0 THEN -1 ELSE 0 END) * 6000
               | div CAST(FLOOR(SQRT(CAST(2 * (n * (n - 1) * (2 * n + 5)
               |     - tie_corr) AS DOUBLE))) AS BIGINT)""".stripMargin)
          .as("z_milli"))
  }

  /** Page–Hinkley drift detector: deviations of each day's revenue
    * from the RUNNING mean (floored prefix mean — a defined metric),
    * their cumulative sum PH_t, the running minimum, and the alarm
    * flag when the gap PH_t - min clears λ = 5 global mean-days.
    * The classic sequential change detector, expressed as three
    * stacked prefix windows.
    *
    * Shape at 100TB: one day aggregate; every window rides the
    * calendar-bounded [[graft.ops.BoundedWindow]] single partition;
    * λ is a one-row aggregate broadcast.
    */
  val pageHinkley: Q = Q(
    "q_page_hinkley",
    """WITH dr AS (SELECT epoch_ms(o_orderdate) // 86400000 AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |lam AS (SELECT CAST(SUM(x) // COUNT(*) AS BIGINT) * 5 AS lambda
      |  FROM dr),
      |m AS (SELECT day, x,
      |    CAST(SUM(x) OVER w AS BIGINT)
      |      // CAST(COUNT(*) OVER w AS BIGINT) AS rmean
      |  FROM dr WINDOW w AS (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |ph AS (SELECT day, x, rmean,
      |    CAST(SUM(x - rmean) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS ph
      |  FROM m),
      |mn AS (SELECT day, x, rmean, ph,
      |    CAST(MIN(ph) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS ph_min
      |  FROM ph)
      |SELECT mn.day, mn.x AS cents, mn.rmean, mn.ph,
      |  mn.ph - mn.ph_min AS ph_gap,
      |  CASE WHEN mn.ph - mn.ph_min > lam.lambda THEN 1 ELSE 0 END
      |    AS alarm
      |FROM mn, lam ORDER BY mn.day""".stripMargin) { (s, d) =>
    import graft.ops.BoundedWindow
    import org.apache.spark.sql.expressions.Window
    val dr = Tables.load(s, d, "orders")
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
        .as("day"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("x"))
    val lam = dr.agg(expr("CAST(SUM(x) div COUNT(*) AS BIGINT) * 5")
      .as("lambda"))
    val w = BoundedWindow.single(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dr.withColumn("csum", sum("x").over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .select(col("day"), col("x"), expr("csum div cnt").as("rmean"))
      .withColumn("ph", sum(col("x") - col("rmean")).over(w))
      .withColumn("ph_min", min("ph").over(w))
      .crossJoin(broadcast(lam))
      .select(col("day"), col("x").as("cents"), col("rmean"), col("ph"),
        (col("ph") - col("ph_min")).as("ph_gap"),
        when(col("ph") - col("ph_min") > col("lambda"), 1L)
          .otherwise(0L).as("alarm"))
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(mannKendall, pageHinkley)
}
