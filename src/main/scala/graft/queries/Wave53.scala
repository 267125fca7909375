package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 53 — population and lifecycle readouts: Lincoln–Petersen /
  * Chapman capture–recapture estimation of the active-customer
  * population from two order-date windows, and the spend-tercile
  * migration matrix between the two halves of the calendar.
  */
object Wave53 {

  /** Capture–recapture: customers ordering in the first third of the
    * date range are the marked sample, customers in the last third
    * the recapture; N̂ = n1*n2/m (Lincoln–Petersen) and the
    * bias-corrected Chapman form (n1+1)(n2+1)/(m+1) - 1, both
    * truncating integers, next to the true distinct-customer count
    * the estimator tries to recover.
    *
    * Shape at 100TB: the epoch boundaries come from one min/max
    * aggregate (broadcast scalar); the three distinct-counts are one
    * customer-keyed aggregate over flags — a single fact shuffle.
    */
  val captureRecapture: Q = Q(
    "q_capture_recapture",
    """WITH b AS (SELECT MIN(epoch_ms(o_orderdate)) AS lo,
      |    MAX(epoch_ms(o_orderdate)) AS hi FROM orders),
      |cu AS (SELECT o_custkey AS ck,
      |    MAX(CASE WHEN epoch_ms(o_orderdate) * 3 < b.lo * 2 + b.hi
      |      THEN 1 ELSE 0 END) AS s1,
      |    MAX(CASE WHEN epoch_ms(o_orderdate) * 3 >= b.lo + b.hi * 2
      |      THEN 1 ELSE 0 END) AS s2
      |  FROM orders, b GROUP BY 1),
      |ag AS (SELECT CAST(SUM(s1) AS BIGINT) AS n1,
      |    CAST(SUM(s2) AS BIGINT) AS n2,
      |    CAST(SUM(s1 * s2) AS BIGINT) AS m,
      |    CAST(COUNT(*) AS BIGINT) AS n_true
      |  FROM cu)
      |SELECT n1, n2, m, n_true,
      |  CASE WHEN m = 0 THEN -1 ELSE n1 * n2 // m END AS n_lp,
      |  (n1 + 1) * (n2 + 1) // (m + 1) - 1 AS n_chapman
      |FROM ag ORDER BY n1""".stripMargin) { (s, d) =>
    val b = Tables.load(s, d, "orders")
      .agg(min(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))")).as("lo"),
        max(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))")).as("hi"))
    val cu = Tables.load(s, d, "orders")
      .crossJoin(broadcast(b))
      .groupBy(col("o_custkey").as("ck"))
      .agg(
        max(when(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) * 3")
          < expr("lo * 2 + hi"), 1L).otherwise(0L)).as("s1"),
        max(when(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) * 3")
          >= expr("lo + hi * 2"), 1L).otherwise(0L)).as("s2"))
    cu.agg(sum("s1").as("n1"), sum("s2").as("n2"),
        sum(expr("s1 * s2")).as("m"), count(lit(1)).as("n_true"))
      .select(col("n1"), col("n2"), col("m"), col("n_true"),
        expr("CASE WHEN m = 0 THEN -1 ELSE n1 * n2 div m END").as("n_lp"),
        expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").as("n_chapman"))
  }

  /** Spend-tercile migration: customers ranked by first-half and
    * second-half spend (calendar midpoint), cut into terciles by
    * global rank (3*rank > k*n buckets — exact, no percentile
    * convention), plus tercile 0 = inactive in that half; the 4x4
    * migration matrix with row-share ppm. The CRM "segment flow"
    * readout.
    *
    * Shape at 100TB: one customer-keyed aggregate; the two global
    * tercile ranks ride [[graft.ops.RankedPrefix]] two-phase passes;
    * the matrix is a 16-row dictionary aggregate.
    */
  val segmentMigration: Q = Q(
    "q_segment_migration",
    """WITH b AS (SELECT MIN(epoch_ms(o_orderdate)) AS lo,
      |    MAX(epoch_ms(o_orderdate)) AS hi FROM orders),
      |cu AS (SELECT o_custkey AS ck,
      |    CAST(SUM(CASE WHEN epoch_ms(o_orderdate) * 2 < b.lo + b.hi
      |      THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) ELSE 0
      |      END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN epoch_ms(o_orderdate) * 2 >= b.lo + b.hi
      |      THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) ELSE 0
      |      END) AS BIGINT) AS c2
      |  FROM orders, b GROUP BY 1),
      |r1 AS (SELECT ck, c1, c2,
      |    CAST(ROW_NUMBER() OVER (ORDER BY c1, ck) AS BIGINT) AS rk1,
      |    CAST(ROW_NUMBER() OVER (ORDER BY c2, ck) AS BIGINT) AS rk2,
      |    CAST(SUM(CASE WHEN c1 > 0 THEN 1 ELSE 0 END) OVER ()
      |      AS BIGINT) AS na1,
      |    CAST(SUM(CASE WHEN c2 > 0 THEN 1 ELSE 0 END) OVER ()
      |      AS BIGINT) AS na2,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n
      |  FROM cu),
      |seg AS (SELECT ck,
      |    CAST(CASE WHEN c1 = 0 THEN 0
      |      WHEN 3 * (rk1 - (n - na1)) > 2 * na1 THEN 3
      |      WHEN 3 * (rk1 - (n - na1)) > na1 THEN 2 ELSE 1 END
      |      AS BIGINT) AS s1,
      |    CAST(CASE WHEN c2 = 0 THEN 0
      |      WHEN 3 * (rk2 - (n - na2)) > 2 * na2 THEN 3
      |      WHEN 3 * (rk2 - (n - na2)) > na2 THEN 2 ELSE 1 END
      |      AS BIGINT) AS s2
      |  FROM r1),
      |mx AS (SELECT s1, s2, CAST(COUNT(*) AS BIGINT) AS n FROM seg
      |  GROUP BY 1, 2),
      |rt AS (SELECT s1, CAST(SUM(n) AS BIGINT) AS row_n FROM mx
      |  GROUP BY 1)
      |SELECT mx.s1 AS seg_h1, mx.s2 AS seg_h2, mx.n,
      |  mx.n * 1000000 // rt.row_n AS row_share_ppm
      |FROM mx JOIN rt ON rt.s1 = mx.s1
      |ORDER BY seg_h1, seg_h2""".stripMargin) { (s, d) =>
    import graft.ops.RankedPrefix
    val b = Tables.load(s, d, "orders")
      .agg(min(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))")).as("lo"),
        max(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))")).as("hi"))
    val cu = Tables.load(s, d, "orders")
      .crossJoin(broadcast(b))
      .groupBy(col("o_custkey").as("ck"))
      .agg(
        sum(when(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) * 2")
          < expr("lo + hi"),
          expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
          .otherwise(0L)).as("c1"),
        sum(when(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) * 2")
          >= expr("lo + hi"),
          expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
          .otherwise(0L)).as("c2"))
    val rk1 = RankedPrefix.rankedCumsum(
      cu, RankedPrefix.logBucket(col("c1")), bucketDesc = false,
      order = Seq(col("c1"), col("ck")), rankCol = Some("rk1"))
    val rk2 = RankedPrefix.rankedCumsum(
      rk1.df, RankedPrefix.logBucket(col("c2")), bucketDesc = false,
      order = Seq(col("c2"), col("ck")), rankCol = Some("rk2"))
    val counts = cu.agg(
      sum(when(col("c1") > 0, 1L).otherwise(0L)).as("na1"),
      sum(when(col("c2") > 0, 1L).otherwise(0L)).as("na2"),
      count(lit(1)).as("n"))
    val seg = rk2.df.crossJoin(broadcast(counts))
      .select(col("ck"),
        expr("""CAST(CASE WHEN c1 = 0 THEN 0
               |  WHEN 3 * (rk1 - (n - na1)) > 2 * na1 THEN 3
               |  WHEN 3 * (rk1 - (n - na1)) > na1 THEN 2 ELSE 1 END
               |  AS BIGINT)""".stripMargin).as("s1"),
        expr("""CAST(CASE WHEN c2 = 0 THEN 0
               |  WHEN 3 * (rk2 - (n - na2)) > 2 * na2 THEN 3
               |  WHEN 3 * (rk2 - (n - na2)) > na2 THEN 2 ELSE 1 END
               |  AS BIGINT)""".stripMargin).as("s2"))
    val mx = seg.groupBy("s1", "s2").agg(count(lit(1)).as("n"))
    val rt = mx.groupBy("s1").agg(sum("n").as("row_n"))
    mx.join(broadcast(rt), Seq("s1"))
      .select(col("s1").as("seg_h1"), col("s2").as("seg_h2"), col("n"),
        expr("n * 1000000 div row_n").as("row_share_ppm"))
      .orderBy("seg_h1", "seg_h2")
  }

  val all: Seq[Q] = Seq(captureRecapture, segmentMigration)
}
