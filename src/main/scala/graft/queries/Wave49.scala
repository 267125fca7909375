package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 49 — distribution comparison and demand variability: the
  * two-sample Kolmogorov–Smirnov distance between segment spend
  * distributions (exact integer cross-products, no CDF floats) and
  * XYZ demand-variability classes per part (closed-form deviation
  * sums, integer sqrt).
  */
object Wave49 {

  private val SegA = "AUTOMOBILE"
  private val SegB = "BUILDING"

  /** Two-sample KS: D = max over the merged spend order of
    * |cumA * nB - cumB * nA| (the CDF gap cross-multiplied into exact
    * integers), reported with d_ppm = D*1e6/(nA*nB) and the spend
    * value and merged rank where the gap first peaks.
    *
    * Shape at 100TB: the merged order's running group counts ride ONE
    * [[graft.ops.RankedPrefix]] two-phase prefix sum (both indicator
    * sums in the same pass — no global window, no second shuffle);
    * the argmax is one tiny aggregate over the gap column.
    */
  val ksTest: Q = Q(
    "q_ks_test",
    s"""WITH cu AS (SELECT o.o_custkey AS ck,
       |    CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
       |      AS BIGINT) AS cents,
       |    MIN(c.c_mktsegment) AS seg
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |  WHERE c.c_mktsegment IN ('$SegA', '$SegB')
       |  GROUP BY 1),
       |r AS (SELECT cents, ck,
       |    CASE WHEN seg = '$SegA' THEN 1 ELSE 0 END AS ia,
       |    CASE WHEN seg = '$SegB' THEN 1 ELSE 0 END AS ib,
       |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rk,
       |    CAST(SUM(CASE WHEN seg = '$SegA' THEN 1 ELSE 0 END) OVER w
       |      AS BIGINT) AS ca,
       |    CAST(SUM(CASE WHEN seg = '$SegB' THEN 1 ELSE 0 END) OVER w
       |      AS BIGINT) AS cb
       |  FROM cu WINDOW w AS (ORDER BY cents, ck
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |t AS (SELECT CAST(SUM(ia) AS BIGINT) AS na,
       |    CAST(SUM(ib) AS BIGINT) AS nb FROM r),
       |g AS (SELECT rk, cents, ABS(ca * t.nb - cb * t.na) AS gap
       |  FROM r, t),
       |m AS (SELECT MAX(gap) AS d_num FROM g),
       |am AS (SELECT MIN(rk) AS at_rank FROM g, m WHERE g.gap = m.d_num)
       |SELECT t.na AS n_a, t.nb AS n_b, m.d_num,
       |  m.d_num * 1000000 // (t.na * t.nb) AS d_ppm,
       |  am.at_rank, ga.cents AS at_cents
       |FROM t, m, am JOIN g ga ON ga.rk = am.at_rank""".stripMargin) {
    (s, d) =>
    import graft.ops.RankedPrefix
    val cu = Tables.load(s, d, "orders")
      .join(Tables.load(s, d, "customer")
        .filter(col("c_mktsegment").isin(SegA, SegB))
        .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg")),
        col("o_custkey") === col("ck"))
      .groupBy("ck")
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"), min("seg").as("seg"))
      .select(col("ck"), col("cents"),
        when(col("seg") === SegA, 1L).otherwise(0L).as("ia"),
        when(col("seg") === SegB, 1L).otherwise(0L).as("ib"))
    val ranked = RankedPrefix.rankedCumsum(
      cu, RankedPrefix.logBucket(col("cents")), bucketDesc = false,
      order = Seq(col("cents"), col("ck")),
      sums = Seq("ia" -> "ca", "ib" -> "cb"), rankCol = Some("rk"))
    val na = ranked.totals("ia")
    val nb = ranked.totals("ib")
    val g = ranked.df.select(col("rk"), col("cents"),
      abs(col("ca") * nb - col("cb") * na).as("gap"))
    val m = g.agg(max("gap").as("d_num"))
    val best = g.crossJoin(broadcast(m))
      .filter(col("gap") === col("d_num"))
      .agg(min(struct(col("rk"), col("cents"))).as("at"))
    m.crossJoin(broadcast(best))
      .select(lit(na).as("n_a"), lit(nb).as("n_b"), col("d_num"),
        expr(s"d_num * 1000000 div (${na}L * ${nb}L)").as("d_ppm"),
        col("at.rk").as("at_rank"), col("at.cents").as("at_cents"))
  }

  /** XYZ demand-variability classes: per part, the coefficient of
    * variation of monthly shipped quantity over the 12 calendar
    * months (absent months count as zero demand). The deviation sum
    * folds closed-form from (n, Σq, Σq²) — no month spine is ever
    * materialized: S = 1e6*Σq² - 2000*m*Σq + 12*m² over the milli
    * mean m = 1000*Σq//12. X: cv < 0.5, Y: cv < 1, else Z.
    *
    * Shape at 100TB: two stacked aggregates (part x month, then
    * part) — both map-side combinable; everything after is row-local
    * arithmetic plus one integer sqrt.
    */
  val xyzClass: Q = Q(
    "q_xyz_class",
    """WITH pm AS (SELECT l_partkey AS pk,
      |    CAST(month(l_shipdate) AS BIGINT) AS mon,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2),
      |p AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_active,
      |    CAST(SUM(q) AS BIGINT) AS tot,
      |    CAST(SUM(q * q) AS BIGINT) AS ss
      |  FROM pm GROUP BY 1),
      |s AS (SELECT pk, n_active, tot, tot * 1000 // 12 AS m3,
      |    1000000 * ss - 2000 * (tot * 1000 // 12) * tot
      |      + 12 * (tot * 1000 // 12) * (tot * 1000 // 12) AS dev2
      |  FROM p),
      |v AS (SELECT pk, n_active, tot, m3,
      |    CAST(FLOOR(SQRT(CAST(dev2 // 12 AS DOUBLE))) AS BIGINT) AS sd3
      |  FROM s)
      |SELECT pk AS partkey, tot AS tot_qty, n_active, m3 AS mean_milli,
      |  sd3 AS sd_milli,
      |  CASE WHEN m3 = 0 THEN -1 ELSE sd3 * 1000000 // m3 END AS cv_ppm,
      |  CASE WHEN m3 = 0 THEN 'Z'
      |       WHEN sd3 * 1000000 // m3 < 500000 THEN 'X'
      |       WHEN sd3 * 1000000 // m3 < 1000000 THEN 'Y'
      |       ELSE 'Z' END AS xyz
      |FROM v ORDER BY pk""".stripMargin) { (s, d) =>
    val pm = Tables.load(s, d, "lineitem")
      .groupBy(col("l_partkey").as("pk"),
        month(col("l_shipdate")).cast("long").as("mon"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"))
    pm.groupBy("pk")
      .agg(count(lit(1)).as("n_active"), sum("q").as("tot"),
        sum(expr("q * q")).as("ss"))
      .select(col("pk"), col("n_active"), col("tot"),
        expr("tot * 1000 div 12").as("m3"), col("ss"))
      .select(col("pk"), col("n_active"), col("tot"), col("m3"),
        expr("1000000 * ss - 2000 * m3 * tot + 12 * m3 * m3").as("dev2"))
      .select(col("pk"), col("n_active"), col("tot"), col("m3"),
        expr("CAST(FLOOR(SQRT(CAST(dev2 div 12 AS DOUBLE))) AS BIGINT)")
          .as("sd3"))
      .select(col("pk").as("partkey"), col("tot").as("tot_qty"),
        col("n_active"), col("m3").as("mean_milli"),
        col("sd3").as("sd_milli"),
        expr("CASE WHEN m3 = 0 THEN -1 ELSE sd3 * 1000000 div m3 END")
          .as("cv_ppm"),
        expr("""CASE WHEN m3 = 0 THEN 'Z'
               |  WHEN sd3 * 1000000 div m3 < 500000 THEN 'X'
               |  WHEN sd3 * 1000000 div m3 < 1000000 THEN 'Y'
               |  ELSE 'Z' END""".stripMargin).as("xyz"))
      .orderBy("partkey")
  }

  val all: Seq[Q] = Seq(ksTest, xyzClass)
}
