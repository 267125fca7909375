package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 56 — distribution distance and tail risk: 1-D earth mover's
  * distance between segment spend histograms (the integral companion
  * to q_ks_test's sup-distance) and conditional value-at-risk of the
  * daily revenue series (expected shortfall over the worst 5%).
  */
object Wave56 {

  private val SegA = "AUTOMOBILE"
  private val SegB = "BUILDING"

  /** 1-D EMD (Wasserstein-1) between the $SegA and $SegB customer
    * spend distributions over $1000 bands: with both histograms
    * normalized by cross-multiplication (no division), the distance
    * is Σ_bands |cumA*nB - cumB*nA| in exact integers, reported raw
    * and normalized to micro band-units (// (nA*nB)).
    *
    * Shape at 100TB: one customer aggregate, one band-dictionary
    * aggregate per group, a band-keyed cumulative window over the
    * bounded band dictionary ([[graft.ops.BoundedWindow]]).
    */
  val emdHistogram: Q = Q(
    "q_emd_histogram",
    s"""WITH cu AS (SELECT o.o_custkey AS ck,
       |    CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
       |      AS BIGINT) AS cents,
       |    MIN(c.c_mktsegment) AS seg
       |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
       |  WHERE c.c_mktsegment IN ('$SegA', '$SegB')
       |  GROUP BY 1),
       |b AS (SELECT cents // 100000 AS band,
       |    CAST(SUM(CASE WHEN seg = '$SegA' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS na_b,
       |    CAST(SUM(CASE WHEN seg = '$SegB' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nb_b
       |  FROM cu GROUP BY 1),
       |t AS (SELECT CAST(SUM(na_b) AS BIGINT) AS na,
       |    CAST(SUM(nb_b) AS BIGINT) AS nb FROM b),
       |c AS (SELECT band,
       |    CAST(SUM(na_b) OVER w AS BIGINT) AS ca,
       |    CAST(SUM(nb_b) OVER w AS BIGINT) AS cb
       |  FROM b WINDOW w AS (ORDER BY band
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT t.na AS n_a, t.nb AS n_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_bands,
       |  CAST(SUM(ABS(c.ca * t.nb - c.cb * t.na)) AS BIGINT)
       |    AS emd_num,
       |  CAST(SUM(ABS(c.ca * t.nb - c.cb * t.na)) * 1000000
       |    // (t.na * t.nb) AS BIGINT) AS emd_micro_bands
       |FROM c, t GROUP BY t.na, t.nb ORDER BY n_a""".stripMargin) {
    (s, d) =>
    import graft.ops.BoundedWindow
    import org.apache.spark.sql.expressions.Window
    val cu = Tables.load(s, d, "orders")
      .join(Tables.load(s, d, "customer")
        .filter(col("c_mktsegment").isin(SegA, SegB))
        .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg")),
        col("o_custkey") === col("ck"))
      .groupBy("ck")
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"), min("seg").as("seg"))
    val b = cu.groupBy(expr("cents div 100000").as("band"))
      .agg(sum(when(col("seg") === SegA, 1L).otherwise(0L)).as("na_b"),
        sum(when(col("seg") === SegB, 1L).otherwise(0L)).as("nb_b"))
    val t = b.agg(sum("na_b").as("na"), sum("nb_b").as("nb"))
    val w = BoundedWindow.single(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("ca", sum("na_b").over(w))
      .withColumn("cb", sum("nb_b").over(w))
      .crossJoin(broadcast(t))
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        count(lit(1)).as("n_bands"),
        sum(abs(col("ca") * col("nb") - col("cb") * col("na")))
          .as("emd_num"))
      .select(col("n_a"), col("n_b"), col("n_bands"), col("emd_num"),
        expr("emd_num * 1000000 div (n_a * n_b)").as("emd_micro_bands"))
  }

  /** CVaR / expected shortfall: the worst 5% of revenue days (k =
    * ceil(n/20) by ascending revenue, day breaking ties), reporting
    * VaR (the k-th order statistic), CVaR (truncating mean of the
    * tail), and the tail's share of total revenue in ppm.
    *
    * Shape at 100TB: one day aggregate; the tail selection is a rank
    * window over the calendar-bounded day dictionary.
    */
  val cvarDaily: Q = Q(
    "q_cvar_daily",
    """WITH dr AS (SELECT epoch_ms(o_orderdate) // 86400000 AS day,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |r AS (SELECT day, cents,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cents, day) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
      |    CAST(SUM(cents) OVER () AS BIGINT) AS tot
      |  FROM dr),
      |k AS (SELECT (n + 19) // 20 AS k, n, tot FROM r LIMIT 1)
      |SELECT k.n AS n_days, k.k AS k_tail,
      |  MAX(CASE WHEN r.rn = k.k THEN r.cents END) AS var_cents,
      |  CAST(SUM(CASE WHEN r.rn <= k.k THEN r.cents ELSE 0 END) // k.k
      |    AS BIGINT) AS cvar_cents,
      |  CAST(SUM(CASE WHEN r.rn <= k.k THEN r.cents ELSE 0 END)
      |    * 1000000 // k.tot AS BIGINT) AS tail_share_ppm
      |FROM r, k GROUP BY k.n, k.k, k.tot ORDER BY n_days""".stripMargin) {
    (s, d) =>
    import graft.ops.BoundedWindow
    val dr = Tables.load(s, d, "orders")
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
        .as("day"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val r = dr
      .withColumn("rn", row_number()
        .over(BoundedWindow.single(col("cents"), col("day")))
        .cast("long"))
    val t = dr.agg(count(lit(1)).as("n"), sum("cents").as("tot"))
      .select(col("n"), col("tot"), expr("(n + 19) div 20").as("k"))
    r.crossJoin(broadcast(t))
      .agg(max("n").as("n_days"), max("k").as("k_tail"),
        max(when(col("rn") === col("k"), col("cents"))).as("var_cents"),
        expr("""CAST(SUM(CASE WHEN rn <= k THEN cents ELSE 0 END)
               | div MAX(k) AS BIGINT)""".stripMargin).as("cvar_cents"),
        expr("""CAST(SUM(CASE WHEN rn <= k THEN cents ELSE 0 END)
               | * 1000000 div MAX(tot) AS BIGINT)""".stripMargin)
          .as("tail_share_ppm"))
  }

  val all: Seq[Q] = Seq(emdHistogram, cvarDaily)
}
