package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 34 — multi-tenant capacity planning: exact max-min fair-share
  * (water-filling) allocation of a slot budget across tenants, the
  * arithmetic behind every fair scheduler (YARN/Kubernetes DRF's
  * single-resource case). Closed form over the sorted demand
  * dictionary: a tenant is SATISFIED iff its demand fits the level
  * implied by the remaining budget, the rest split the residue
  * evenly, and the integer remainder goes to the smallest-demand
  * unsatisfied tenants — every step integer, every tie ordered.
  */
object Wave34 {

  /** Max-min fair allocation of C = sum(demand)//2 slots across
    * nations (demand = order count): sorted by (demand, nation), a
    * tenant r is satisfied iff  d_r * (n-r+1) <= C - prefix_{r-1}
    * (the classic water-filling condition — monotone in r, so the
    * satisfied set is a prefix); unsatisfied tenants get
    * (C - p_k) // (n-k) each, the first (C - p_k) % (n-k) of them
    * one extra. Output: nation, demand, allocation, satisfied flag.
    *
    * Shape at 100TB: one nation-keyed aggregate collapses the data;
    * the sort, prefix sums and cutoff all run on the tenant
    * dictionary ([[graft.ops.BoundedWindow]]).
    */
  val fairshareMaxmin: Q = Q(
    "q_fairshare_maxmin",
    """WITH d AS (SELECT c.c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS dem
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1),
      |t AS (SELECT CAST(SUM(dem) AS BIGINT) AS td,
      |    CAST(SUM(dem) // 2 AS BIGINT) AS cap,
      |    CAST(COUNT(*) AS BIGINT) AS n FROM d),
      |r AS (SELECT nk, dem,
      |    ROW_NUMBER() OVER (ORDER BY dem, nk) AS rr,
      |    CAST(COALESCE(SUM(dem) OVER (ORDER BY dem, nk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS pre
      |  FROM d),
      |s AS (SELECT r.*, t.cap, t.n,
      |    CASE WHEN r.dem * (t.n - r.rr + 1) <= t.cap - r.pre
      |      THEN 1 ELSE 0 END AS sat
      |  FROM r, t),
      |k AS (SELECT CAST(COALESCE(SUM(sat), 0) AS BIGINT) AS kk,
      |    CAST(COALESCE(SUM(CASE WHEN sat = 1 THEN dem END), 0) AS BIGINT)
      |      AS pk
      |  FROM s)
      |SELECT s.nk, s.dem,
      |  CAST(CASE WHEN s.sat = 1 THEN s.dem
      |    ELSE (s.cap - k.pk) // (s.n - k.kk)
      |      + CASE WHEN s.rr - k.kk <= (s.cap - k.pk) % (s.n - k.kk)
      |        THEN 1 ELSE 0 END END AS BIGINT) AS alloc,
      |  CAST(s.sat AS BIGINT) AS satisfied
      |FROM s, k ORDER BY s.nk""".stripMargin) { (s, d) =>
    import graft.ops.BoundedWindow
    val cust = Tables.load(s, d, "customer")
      .select(col("c_custkey").as("o_custkey"),
        col("c_nationkey").cast("long").as("nk"))
    val dem = Tables.load(s, d, "orders")
      .join(cust, "o_custkey")
      .groupBy("nk").agg(count(lit(1)).as("dem"))
    val t = dem.agg(sum("dem").as("td"),
      expr("CAST(SUM(dem) div 2 AS BIGINT)").as("cap"),
      count(lit(1)).as("n"))
    val ord = BoundedWindow.singleRef(col("dem"), col("dem").asc,
      col("nk").asc)
    val r = dem
      .withColumn("rr", row_number().over(ord))
      .withColumn("pre", coalesce(sum("dem").over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val sdf = r.crossJoin(broadcast(t))
      .withColumn("sat",
        when(expr("dem * (n - rr + 1) <= cap - pre"), 1).otherwise(0))
    val k = sdf.agg(
      coalesce(sum("sat"), lit(0)).cast("long").as("kk"),
      coalesce(sum(when(col("sat") === 1, col("dem"))), lit(0L)).as("pk"))
    sdf.crossJoin(broadcast(k))
      .select(col("nk"), col("dem"),
        expr("""CAST(CASE WHEN sat = 1 THEN dem
               |  ELSE (cap - pk) div (n - kk)
               |    + CASE WHEN rr - kk <= (cap - pk) % (n - kk)
               |      THEN 1 ELSE 0 END END AS BIGINT)""".stripMargin)
          .as("alloc"),
        col("sat").cast("long").as("satisfied"))
      .orderBy("nk")
  }

  val all: Seq[Q] = Seq(fairshareMaxmin)
}
