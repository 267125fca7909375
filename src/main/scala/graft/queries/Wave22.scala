package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 22 — model-quality operators: change-point detection over the
  * monthly revenue series (one step of binary segmentation, Scott &
  * Knott 1974 / the CUSUM-of-squares family) and isotonic calibration
  * of bucketed score->rate curves (PAV via the minimax identity,
  * Ayer et al. 1955). Both reduce the data to a bounded dictionary
  * (calendar months / score buckets) before any quadratic step, and
  * both stay in the exact-integer lane.
  */
object Wave22 {

  /** One step of binary segmentation over monthly order revenue (whole
    * dollars): for every candidate split after month m, the gain
    * score  g = (SL^2//nL + SR^2//nR) // nT  (maximizing the bracket
    * minimizes total within-segment SSE, since sum(x^2) is
    * split-invariant; the //nT rescale keeps the reported score near
    * the per-row mean-square). Output is the full candidate scan —
    * per split: segment sizes, sums, means and score — with is_best
    * marking the argmax (ties to the earliest month). The squares run
    * in DECIMAL(38)/HUGEINT — a BIGINT square overflows past segment
    * sums of ~3e9 dollars, which sf0.01 already reaches — and the
    * rescaled score ~ nT * mean^2 / nT stays far inside BIGINT at any
    * scale.
    *
    * Shape at 100TB: one month-keyed aggregate collapses the data to a
    * calendar-bounded frame; prefix sums and the argmax run on that
    * dictionary ([[graft.ops.BoundedWindow]] — months, not rows).
    */
  val changepointBinseg: Q = Q(
    "q_changepoint_binseg",
    """WITH m AS (SELECT EXTRACT(YEAR FROM o_orderdate) * 100
      |      + EXTRACT(MONTH FROM o_orderdate) AS month,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) // 100)
      |      AS BIGINT) AS rev,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM orders GROUP BY 1),
      |p AS (SELECT month, rev, n,
      |    CAST(SUM(rev) OVER (ORDER BY month) AS BIGINT) AS sl,
      |    CAST(SUM(n) OVER (ORDER BY month) AS BIGINT) AS nl
      |  FROM m),
      |t AS (SELECT CAST(SUM(rev) AS BIGINT) AS st,
      |    CAST(SUM(n) AS BIGINT) AS nt FROM m),
      |c AS (SELECT p.month AS split_month, p.nl AS n_l,
      |    t.nt - p.nl AS n_r, p.sl AS sum_l, t.st - p.sl AS sum_r,
      |    CAST((CAST(p.sl AS HUGEINT) * p.sl // p.nl
      |      + CAST(t.st - p.sl AS HUGEINT) * (t.st - p.sl)
      |        // (t.nt - p.nl)) // t.nt AS BIGINT) AS score
      |  FROM p, t WHERE p.nl < t.nt),
      |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC,
      |    split_month) AS rk FROM c)
      |SELECT split_month, n_l, n_r, sum_l, sum_r,
      |  sum_l // n_l AS mean_l, sum_r // n_r AS mean_r, score,
      |  CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best
      |FROM r ORDER BY split_month""".stripMargin) { (s, d) =>
    import graft.ops.BoundedWindow
    val m = Tables.load(s, d, "orders")
      .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .cast("long").as("month"))
      .agg(
        sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) div 100"))
          .as("rev"),
        count(lit(1)).as("n"))
    val pre = BoundedWindow.single(col("month"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = m
      .withColumn("sl", sum("rev").over(pre))
      .withColumn("nl", sum("n").over(pre))
    val t = m.agg(sum("rev").as("st"), sum("n").as("nt"))
    val c = p.crossJoin(broadcast(t))
      .filter(col("nl") < col("nt"))
      .select(col("month").as("split_month"), col("nl").as("n_l"),
        (col("nt") - col("nl")).as("n_r"), col("sl").as("sum_l"),
        (col("st") - col("sl")).as("sum_r"),
        expr("""CAST((CAST(sl AS DECIMAL(38,0)) * sl div nl
               |  + CAST(st - sl AS DECIMAL(38,0)) * (st - sl)
               |    div (nt - nl)) div nt AS BIGINT)""".stripMargin)
          .as("score"))
    val rk = BoundedWindow.singleRef(col("split_month"),
      col("score").desc, col("split_month").asc)
    c.withColumn("rk", row_number().over(rk))
      .select(col("split_month"), col("n_l"), col("n_r"), col("sum_l"),
        col("sum_r"), expr("sum_l div n_l").as("mean_l"),
        expr("sum_r div n_r").as("mean_r"), col("score"),
        when(col("rk") === 1, 1L).otherwise(0L).as("is_best"))
      .orderBy("split_month")
  }

  /** Isotonic (monotone nondecreasing) calibration of the bucketed
    * score->positive-rate curve — the same buckets and labels as
    * q_auc_calibration — via the PAV minimax identity:
    *   iso(b) = max_{i<=b} min_{j>=b} rate(i..j)
    * where rate(i..j) is the count-weighted positive rate of buckets
    * i..j in truncating ppm. The enumeration is over bucket RANGES, so
    * the quadratic term is (score dictionary)^2, never data-sized.
    *
    * Shape at 100TB: one aggregate to ~dozens of bucket rows, prefix
    * sums on the dictionary ([[graft.ops.BoundedWindow]]), then two
    * dictionary-sized joins (ranges build, minimax fold). The fitted
    * curve is monotone by construction — Wave22Spec asserts it.
    */
  val isotonicCalibration: Q = Q(
    "q_isotonic_calibration",
    """WITH lab AS (SELECT n_chars // 32 AS b,
      |    CASE WHEN source IN ('src0', 'src1', 'src2') THEN 1 ELSE 0 END
      |      AS y
      |  FROM documents),
      |g AS (SELECT b, CAST(SUM(y) AS BIGINT) AS n_pos,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM lab GROUP BY 1),
      |p AS (SELECT b, n_pos, n,
      |    CAST(SUM(n_pos) OVER (ORDER BY b) AS BIGINT) AS cpos,
      |    CAST(SUM(n) OVER (ORDER BY b) AS BIGINT) AS cn
      |  FROM g),
      |rg AS (SELECT lo.b AS i, hi.b AS j,
      |    (hi.cpos - lo.cpos + lo.n_pos) * 1000000
      |      // (hi.cn - lo.cn + lo.n) AS rate_ppm
      |  FROM p lo JOIN p hi ON lo.b <= hi.b),
      |mn AS (SELECT g.b, rg.i,
      |    CAST(MIN(rg.rate_ppm) AS BIGINT) AS min_rate
      |  FROM g JOIN rg ON rg.i <= g.b AND rg.j >= g.b
      |  GROUP BY g.b, rg.i),
      |iso AS (SELECT b, CAST(MAX(min_rate) AS BIGINT) AS iso_ppm
      |  FROM mn GROUP BY b)
      |SELECT g.b, g.n_pos, g.n - g.n_pos AS n_neg,
      |  CAST(g.n_pos * 1000000 // g.n AS BIGINT) AS rate_ppm,
      |  iso.iso_ppm
      |FROM g JOIN iso ON iso.b = g.b ORDER BY g.b""".stripMargin) { (s, d) =>
    import graft.ops.BoundedWindow
    val g = Tables.load(s, d, "documents")
      .select(expr("n_chars div 32").as("b"),
        when(col("source").isin("src0", "src1", "src2"), 1L).otherwise(0L)
          .as("y"))
      .groupBy("b")
      .agg(sum("y").as("n_pos"), count(lit(1)).as("n"))
    val pre = BoundedWindow.single(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val p = g
      .withColumn("cpos", sum("n_pos").over(pre))
      .withColumn("cn", sum("n").over(pre))
    val lo = p.select(col("b").as("i"), col("cpos").as("lo_cpos"),
      col("cn").as("lo_cn"), col("n_pos").as("lo_pos"), col("n").as("lo_n"))
    val hi = p.select(col("b").as("j"), col("cpos").as("hi_cpos"),
      col("cn").as("hi_cn"))
    val rg = lo.join(hi, col("i") <= col("j"))
      .select(col("i"), col("j"),
        expr("""(hi_cpos - lo_cpos + lo_pos) * 1000000
               |  div (hi_cn - lo_cn + lo_n)""".stripMargin).as("rate_ppm"))
    val mn = g.select(col("b"))
      .join(rg, col("i") <= col("b") && col("j") >= col("b"))
      .groupBy("b", "i")
      .agg(min("rate_ppm").as("min_rate"))
    val iso = mn.groupBy("b").agg(max("min_rate").as("iso_ppm"))
    g.join(iso, "b")
      .select(col("b"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        expr("CAST(n_pos * 1000000 div n AS BIGINT)").as("rate_ppm"),
        col("iso_ppm"))
      .orderBy("b")
  }

  val all: Seq[Q] = Seq(changepointBinseg, isotonicCalibration)
}
