package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 47 — operations analytics: Bollinger breakout bands over the
  * daily revenue curve (trailing-window mean/sd in exact cents) and
  * the economic-order-quantity policy table per part. sqrt of exact
  * integers is the only libm call (IEEE-exact, hash-safe).
  */
object Wave47 {

  /** Bollinger bands: trailing-7-day mean and standard deviation of
    * daily revenue (RANGE frame over the day axis — quiet days count),
    * bands at mean +- sd, and the breakout flag (+1 above, -1 below).
    * Variance uses the exact-integer identity
    * ss - 2*m*s + n*m^2 over the floor'd mean m — a deterministic
    * metric definition with no float accumulation; the squared-cents
    * sum rides DECIMAL(38)/HUGEINT (a day's cents^2 already nears
    * BIGINT range at sf0.1).
    *
    * Shape at 100TB: one day aggregate, then calendar-bounded windows
    * on the [[graft.ops.BoundedWindow]] pinned single partition.
    */
  val bollinger: Q = Q(
    "q_bollinger_bands",
    """WITH dr AS (SELECT epoch_ms(o_orderdate) // 86400000 AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |w AS (SELECT day, cents,
      |    CAST(COUNT(*) OVER tw AS BIGINT) AS n7,
      |    CAST(SUM(cents) OVER tw AS BIGINT) AS s7,
      |    SUM(CAST(cents AS HUGEINT) * cents) OVER tw AS ss7
      |  FROM dr WINDOW tw AS (ORDER BY day
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |m AS (SELECT day, cents, n7, s7 // n7 AS mean7,
      |    CAST(FLOOR(SQRT(CAST((ss7 - 2 * CAST(s7 // n7 AS HUGEINT) * s7
      |      + n7 * CAST(s7 // n7 AS HUGEINT) * (s7 // n7)) // n7
      |      AS DOUBLE))) AS BIGINT) AS sd7
      |  FROM w)
      |SELECT day, cents, n7, mean7, sd7,
      |  mean7 + sd7 AS upper_band, mean7 - sd7 AS lower_band,
      |  CASE WHEN cents > mean7 + sd7 THEN 1
      |       WHEN cents < mean7 - sd7 THEN -1 ELSE 0 END AS breakout
      |FROM m ORDER BY day""".stripMargin) { (s, d) =>
    import graft.ops.BoundedWindow
    import org.apache.spark.sql.expressions.Window
    val dr = Tables.load(s, d, "orders")
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
        .as("day"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val tw = BoundedWindow.single(col("day"))
      .rangeBetween(-6, Window.currentRow)
    dr.withColumn("n7", count(lit(1)).over(tw))
      .withColumn("s7", sum("cents").over(tw))
      .withColumn("ss7",
        sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).over(tw))
      .select(col("day"), col("cents"), col("n7"),
        expr("s7 div n7").as("mean7"),
        expr("""CAST(FLOOR(SQRT(CAST((ss7
               |  - 2 * CAST(s7 div n7 AS DECIMAL(38,0)) * s7
               |  + n7 * CAST(s7 div n7 AS DECIMAL(38,0)) * (s7 div n7))
               |  div n7 AS DOUBLE))) AS BIGINT)""".stripMargin).as("sd7"))
      .select(col("day"), col("cents"), col("n7"), col("mean7"), col("sd7"),
        (col("mean7") + col("sd7")).as("upper_band"),
        (col("mean7") - col("sd7")).as("lower_band"),
        when(col("cents") > col("mean7") + col("sd7"), 1L)
          .when(col("cents") < col("mean7") - col("sd7"), -1L)
          .otherwise(0L).as("breakout"))
      .orderBy("day")
  }

  /** Economic order quantity per part: EOQ = sqrt(2*D*S/h) with
    * demand D = total shipped quantity, fixed ordering cost S =
    * $100.00, holding cost h = the part's retail price in cents per
    * unit-period — all integer, the quotient floor'd before the
    * integer sqrt. Reports order count D//EOQ and cycle length
    * 365*EOQ//D alongside.
    *
    * Shape at 100TB: one part-keyed fact aggregate + an un-hinted dim
    * join; arithmetic after is row-local.
    */
  val eoq: Q = Q(
    "q_eoq_policy",
    """WITH dem AS (SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS demand
      |  FROM lineitem GROUP BY 1),
      |e AS (SELECT d.pk, d.demand,
      |    CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT) AS hold_c,
      |    CAST(FLOOR(SQRT(CAST(2 * d.demand * 10000
      |      // CAST(ROUND(p.p_retailprice * 100, 0) AS BIGINT)
      |      AS DOUBLE))) AS BIGINT) AS eoq
      |  FROM dem d JOIN part p ON p.p_partkey = d.pk)
      |SELECT pk AS partkey, demand, hold_c, eoq,
      |  CASE WHEN eoq = 0 THEN demand ELSE demand // eoq END AS n_orders,
      |  CASE WHEN demand = 0 THEN 0 ELSE 365 * GREATEST(eoq, 1) // demand
      |    END AS cycle_days
      |FROM e ORDER BY pk""".stripMargin) { (s, d) =>
    val dem = Tables.load(s, d, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("demand"))
    dem.join(Tables.load(s, d, "part"),
        col("p_partkey") === col("pk"))
      .select(col("pk"), col("demand"),
        expr("CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)").as("hold_c"))
      .select(col("pk").as("partkey"), col("demand"), col("hold_c"),
        expr("""CAST(FLOOR(SQRT(CAST(2 * demand * 10000 div hold_c
               |  AS DOUBLE))) AS BIGINT)""".stripMargin).as("eoq"))
      .select(col("partkey"), col("demand"), col("hold_c"), col("eoq"),
        expr("CASE WHEN eoq = 0 THEN demand ELSE demand div eoq END")
          .as("n_orders"),
        expr("""CASE WHEN demand = 0 THEN 0
               |  ELSE 365 * GREATEST(eoq, 1) div demand END"""
          .stripMargin).as("cycle_days"))
      .orderBy("partkey")
  }

  val all: Seq[Q] = Seq(bollinger, eoq)
}
