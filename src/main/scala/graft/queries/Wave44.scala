package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 44 — uncertainty-aware readouts: Wilson lower-confidence-bound
  * ranking of brand fulfillment rates, and the Wald–Wolfowitz runs
  * test for serial dependence in daily revenue movements. All math in
  * exact integers; the only libm call is sqrt (the one IEEE-exact
  * libm function — see CLAUDE.md), applied to identically-constructed
  * arguments on both engines.
  */
object Wave44 {

  /** Wilson LCB (z = 2) of each brand's non-return rate — the
    * "sort by lower bound, not by rate" ranking that keeps small-n
    * brands from floating to the top. Fully integer pipeline:
    *   lcb = (s + z^2/2 - z*sqrt(s(n-s)/n + z^2/4)) / (n + z^2)
    * with z = 2, scaled to ppm via a floor'd integer sqrt of the
    * 1e6-scaled discriminant.
    *
    * Shape at 100TB: one map-side-combinable aggregate to the brand
    * dictionary; everything after is dictionary-sized arithmetic.
    */
  val wilsonLcb: Q = Q(
    "q_wilson_lcb",
    """WITH b AS (SELECT p.p_brand AS brand,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN l.l_returnflag <> 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS s
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1),
      |w AS (SELECT brand, n, s,
      |    s * 1000000 // n AS rate_ppm,
      |    CAST(FLOOR(SQRT(CAST(s * (n - s) * 1000000 // n + 1000000
      |      AS DOUBLE))) AS BIGINT) AS isq
      |  FROM b)
      |SELECT brand, n, s, rate_ppm,
      |  ((s + 2) * 1000000 - 2000 * isq) // (n + 4) AS lcb_ppm
      |FROM w ORDER BY lcb_ppm DESC, brand""".stripMargin) { (s, d) =>
    val b = Tables.load(s, d, "lineitem")
      .join(Tables.load(s, d, "part"),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L)).as("s"))
    b.select(col("brand"), col("n"), col("s"),
        expr("s * 1000000 div n").as("rate_ppm"),
        expr("""CAST(FLOOR(SQRT(CAST(s * (n - s) * 1000000 div n + 1000000
               |  AS DOUBLE))) AS BIGINT)""".stripMargin).as("isq"))
      .select(col("brand"), col("n"), col("s"), col("rate_ppm"),
        expr("((s + 2) * 1000000 - 2000 * isq) div (n + 4)").as("lcb_ppm"))
      .orderBy(col("lcb_ppm").desc, col("brand"))
  }

  /** Wald–Wolfowitz runs test on the signs of day-over-day revenue
    * deltas: too few runs = trending, too many = oscillating. Reports
    * the run count against its null mean (micro) and variance (e12),
    * plus the z-score in milli via an integer sqrt of the e12-scaled
    * variance. Zero deltas are excised (the classic two-sample
    * reduction); all divisions truncate identically on both engines.
    *
    * Shape at 100TB: the day grid is calendar-bounded, so the two
    * lag windows run on a [[graft.ops.BoundedWindow]] pinned single
    * partition; the only data-sized work is the first aggregate.
    */
  val runsTest: Q = Q(
    "q_runs_test",
    """WITH dr AS (SELECT epoch_ms(o_orderdate) // 86400000 AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |dl AS (SELECT day,
      |    cents - LAG(cents) OVER (ORDER BY day) AS delta
      |  FROM dr),
      |sg AS (SELECT day, CASE WHEN delta > 0 THEN 1 ELSE -1 END AS sgn
      |  FROM dl WHERE delta IS NOT NULL AND delta <> 0),
      |rn AS (SELECT sgn,
      |    CASE WHEN LAG(sgn) OVER (ORDER BY day) IS NULL
      |      OR LAG(sgn) OVER (ORDER BY day) <> sgn THEN 1 ELSE 0 END
      |      AS new_run
      |  FROM sg),
      |ag AS (SELECT
      |    CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
      |    CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nn,
      |    CAST(SUM(new_run) AS BIGINT) AS runs
      |  FROM rn),
      |st AS (SELECT np, nn, runs,
      |    1000000 + 2000000 * np * nn // (np + nn) AS mu_micro,
      |    CAST(CAST(2 * np * nn AS HUGEINT) * (2 * np * nn - np - nn)
      |        * 1000000000000
      |        // (CAST(np + nn AS HUGEINT) * (np + nn) * (np + nn - 1))
      |      AS BIGINT) AS var_e12
      |  FROM ag)
      |SELECT np AS n_pos, nn AS n_neg, runs AS n_runs, mu_micro, var_e12,
      |  (runs * 1000000 - mu_micro) * 1000
      |    // CAST(FLOOR(SQRT(CAST(var_e12 AS DOUBLE))) AS BIGINT)
      |    AS z_milli
      |FROM st""".stripMargin) { (s, d) =>
    import graft.ops.BoundedWindow
    val dr = Tables.load(s, d, "orders")
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
        .as("day"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val byDay = BoundedWindow.single(col("day"))
    val sg = dr
      .withColumn("delta", col("cents") - lag("cents", 1).over(byDay))
      .filter(col("delta").isNotNull && col("delta") =!= 0)
      .select(col("day"),
        when(col("delta") > 0, 1L).otherwise(-1L).as("sgn"))
    val rn = sg.withColumn("prev", lag("sgn", 1).over(byDay))
      .select(col("sgn"),
        when(col("prev").isNull || col("prev") =!= col("sgn"), 1L)
          .otherwise(0L).as("new_run"))
    rn.agg(
        sum(when(col("sgn") === 1L, 1L).otherwise(0L)).as("np"),
        sum(when(col("sgn") === -1L, 1L).otherwise(0L)).as("nn"),
        sum("new_run").as("runs"))
      .select(col("np"), col("nn"), col("runs"),
        expr("1000000 + 2000000 * np * nn div (np + nn)").as("mu_micro"),
        expr("""CAST(CAST(2 * np * nn AS DECIMAL(38,0))
               |    * (2 * np * nn - np - nn) * 1000000000000
               |  div (CAST(np + nn AS DECIMAL(38,0)) * (np + nn)
               |       * (np + nn - 1)) AS BIGINT)""".stripMargin)
          .as("var_e12"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        col("runs").as("n_runs"), col("mu_micro"), col("var_e12"),
        expr("""(runs * 1000000 - mu_micro) * 1000
               |  div CAST(FLOOR(SQRT(CAST(var_e12 AS DOUBLE)))
               |    AS BIGINT)""".stripMargin).as("z_milli"))
  }

  val all: Seq[Q] = Seq(wilsonLcb, runsTest)
}
