package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Wave 75 — q_eval_brier: the Brier score with Murphy's (1973)
  * decomposition BS = REL − RES + UNC — the proper-scoring-rule
  * calibration audit next to q_auc_calibration's ranking readout. A
  * bucket-wise forecaster is FIT ON THE TRAIN SPLIT (Laplace-smoothed
  * positive rate per n_chars-bucket, the md5 split gate) and scored
  * on the held-out test split, so the forecast is a real forecast,
  * not the evaluation set's own rate.
  *
  * Determinism: the forecast f_ppm is one truncating division;
  * per-bucket Σ(f − y·1e6)² folds CLOSED-FORM from (n, o):
  * n·f² − 2·f·o·1e6 + o·1e12 (no per-row math survives the first
  * aggregate); REL/RES land as single truncating divisions of exact
  * squares in the 38-digit lane. At our scales every intermediate
  * fits; past ~1e9 test rows the RES numerator (o_b·N − O·n_b)²
  * approaches the 38-digit ceiling and would need the rate-ppm
  * rescaling — noted, not needed here.
  *
  * Shape at 100TB: two aggregates to the bounded n_chars-bucket
  * dictionary (train fit, test eval), one one-row global broadcast —
  * nothing after the first aggregate is data-sized.
  */
object Wave75 {

  val evalBrier: Q = Q(
    "q_eval_brier",
    """WITH lab AS (SELECT doc_id, n_chars // 32 AS b,
      |    CASE WHEN source IN ('src0', 'src1', 'src2') THEN 1 ELSE 0 END
      |      AS y,
      |    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '80' THEN 1 ELSE 0 END
      |      AS tr
      |  FROM documents),
      |f AS MATERIALIZED (SELECT b,
      |    CAST(COALESCE(SUM(CASE WHEN tr = 1 THEN y END), 0) AS BIGINT)
      |      AS o_tr,
      |    CAST(COUNT(CASE WHEN tr = 1 THEN 1 END) AS BIGINT) AS n_tr
      |  FROM lab GROUP BY 1),
      |fc AS (SELECT b, n_tr,
      |    (o_tr + 1) * 1000000 // (n_tr + 2) AS f_ppm FROM f),
      |t AS MATERIALIZED (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_te,
      |    CAST(SUM(y) AS BIGINT) AS o_te
      |  FROM lab WHERE tr = 0 GROUP BY 1),
      |g AS (SELECT CAST(SUM(n_te) AS BIGINT) AS nn,
      |    CAST(SUM(o_te) AS BIGINT) AS oo FROM t),
      |per AS MATERIALIZED (SELECT t.b, t.n_te, t.o_te, fc.f_ppm,
      |    CAST(CAST(t.n_te AS HUGEINT) * fc.f_ppm * fc.f_ppm
      |         - CAST(2 AS HUGEINT) * fc.f_ppm * t.o_te * 1000000
      |         + CAST(t.o_te AS HUGEINT) * 1000000000000 AS BIGINT)
      |      AS bs_e12,
      |    CAST(CAST(t.n_te * fc.f_ppm - t.o_te * 1000000 AS HUGEINT)
      |         * (t.n_te * fc.f_ppm - t.o_te * 1000000)
      |         // t.n_te AS BIGINT) AS rel_e12,
      |    CAST(CAST(t.o_te * g.nn - g.oo * t.n_te AS HUGEINT)
      |         * (t.o_te * g.nn - g.oo * t.n_te) * 1000000000000
      |         // (CAST(t.n_te AS HUGEINT) * g.nn * g.nn) AS BIGINT)
      |      AS res_e12
      |  FROM t JOIN fc ON fc.b = t.b CROSS JOIN g),
      |tot AS (SELECT CAST(SUM(bs_e12) AS BIGINT) AS bs_tot,
      |    CAST(SUM(rel_e12) AS BIGINT) AS rel_tot,
      |    CAST(SUM(res_e12) AS BIGINT) AS res_tot FROM per)
      |SELECT per.b, per.n_te, per.o_te, per.f_ppm,
      |  per.bs_e12, per.rel_e12, per.res_e12,
      |  tot.bs_tot, tot.rel_tot, tot.res_tot,
      |  CAST(CAST(g.oo AS HUGEINT) * (g.nn - g.oo) * 1000000000000
      |       // g.nn AS BIGINT) AS unc_tot
      |FROM per CROSS JOIN tot CROSS JOIN g
      |ORDER BY per.b""".stripMargin) { (s, d) =>
    val lab = Tables.load(s, d, "documents")
      .select(col("doc_id"), expr("n_chars div 32").as("b"),
        when(col("source").isin("src0", "src1", "src2"), 1L).otherwise(0L)
          .as("y"),
        when(md5(col("doc_id").cast("string").cast("binary")) < "80", 1L)
          .otherwise(0L).as("tr"))
    val fc = lab.groupBy("b")
      .agg(coalesce(sum(when(col("tr") === 1, col("y"))), lit(0L)).as("o_tr"),
        count(when(col("tr") === 1, 1)).as("n_tr"))
      .select(col("b"), col("n_tr"),
        expr("(o_tr + 1) * 1000000 div (n_tr + 2)").as("f_ppm"))
    val t = lab.filter(col("tr") === 0)
      .groupBy("b")
      .agg(count(lit(1)).as("n_te"), sum("y").as("o_te"))
    val g = t.agg(sum("n_te").as("nn"), sum("o_te").as("oo"))
    val per = t.join(fc, "b").crossJoin(broadcast(g))
      .select(col("b"), col("n_te"), col("o_te"), col("f_ppm"),
        expr("""CAST(CAST(n_te AS DECIMAL(38,0)) * f_ppm * f_ppm
               |     - CAST(2 AS DECIMAL(38,0)) * f_ppm * o_te * 1000000
               |     + CAST(o_te AS DECIMAL(38,0)) * 1000000000000
               |     AS BIGINT)""".stripMargin).as("bs_e12"),
        expr("""CAST(CAST(n_te * f_ppm - o_te * 1000000 AS DECIMAL(38,0))
               |     * (n_te * f_ppm - o_te * 1000000)
               |     div n_te AS BIGINT)""".stripMargin).as("rel_e12"),
        expr("""CAST(CAST(o_te * nn - oo * n_te AS DECIMAL(38,0))
               |     * (o_te * nn - oo * n_te) * 1000000000000
               |     div (CAST(n_te AS DECIMAL(38,0)) * nn * nn)
               |     AS BIGINT)""".stripMargin).as("res_e12"))
    val tot = per.agg(sum("bs_e12").as("bs_tot"),
      sum("rel_e12").as("rel_tot"), sum("res_e12").as("res_tot"))
    per.crossJoin(broadcast(tot)).crossJoin(broadcast(g))
      .select(col("b"), col("n_te"), col("o_te"), col("f_ppm"),
        col("bs_e12"), col("rel_e12"), col("res_e12"),
        col("bs_tot"), col("rel_tot"), col("res_tot"),
        expr("""CAST(CAST(oo AS DECIMAL(38,0)) * (nn - oo) * 1000000000000
               |     div nn AS BIGINT)""".stripMargin).as("unc_tot"))
      .orderBy("b")
  }

  val all: Seq[Q] = Seq(evalBrier)
}
