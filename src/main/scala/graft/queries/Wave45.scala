package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 45 — aggregation-bias diagnostics: a Simpson's-paradox flip
  * detector over brand strata (division-free integer slope signs) and
  * Tukey median polish of the nation x calendar-month revenue matrix
  * (rank-selected medians, exact cents).
  */
object Wave45 {

  private val PolishRounds = 4

  /** Simpson's paradox scan: the discount→quantity association,
    * overall vs within each brand stratum. The OLS slope sign is the
    * sign of n*Σxy − Σx*Σy — an exact integer, so no division or
    * float ever enters; a stratum "flips" when its sign opposes the
    * pooled sign. Reports each brand's slope numerator next to the
    * pooled one.
    *
    * Shape at 100TB: one map-side aggregate to the brand dictionary
    * (the pooled moments are the dictionary re-aggregated, not a
    * second fact scan), then dictionary-sized arithmetic.
    */
  val simpsonFlip: Q = Q(
    "q_simpson_flip",
    """WITH m AS (SELECT p.p_brand AS brand,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(ROUND(l.l_discount * 100, 0) AS BIGINT))
      |      AS BIGINT) AS sx,
      |    CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sy,
      |    CAST(SUM(CAST(ROUND(l.l_discount * 100, 0) AS BIGINT)
      |      * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sxy
      |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |  GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
      |    CAST(SUM(sx) AS BIGINT) AS sx, CAST(SUM(sy) AS BIGINT) AS sy,
      |    CAST(SUM(sxy) AS BIGINT) AS sxy FROM m)
      |SELECT m.brand, m.n,
      |  m.n * m.sxy - m.sx * m.sy AS slope_num,
      |  t.n * t.sxy - t.sx * t.sy AS pooled_num,
      |  CASE WHEN (m.n * m.sxy - m.sx * m.sy) *
      |    (t.n * t.sxy - t.sx * t.sy) < 0 THEN 1 ELSE 0 END AS flipped
      |FROM m, t ORDER BY m.brand""".stripMargin) { (s, d) =>
    val m = Tables.load(s, d, "lineitem")
      .join(Tables.load(s, d, "part"),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)")).as("sx"),
        sum(expr("CAST(l_quantity AS BIGINT)")).as("sy"),
        sum(expr("""CAST(ROUND(l_discount * 100, 0) AS BIGINT)
                   | * CAST(l_quantity AS BIGINT)""".stripMargin))
          .as("sxy"))
    val t = m.agg(sum("n").as("tn"), sum("sx").as("tsx"),
      sum("sy").as("tsy"), sum("sxy").as("tsxy"))
    m.crossJoin(broadcast(t))
      .select(col("brand"), col("n"),
        expr("n * sxy - sx * sy").as("slope_num"),
        expr("tn * tsxy - tsx * tsy").as("pooled_num"),
        when(expr("(n * sxy - sx * sy) * (tn * tsxy - tsx * tsy)") < 0, 1L)
          .otherwise(0L).as("flipped"))
      .orderBy("brand")
  }

  /** Tukey median polish of the nation x calendar-month revenue-cents
    * matrix: $PolishRounds alternating row/column sweeps, each
    * subtracting the rank-selected LOWER median ((n+1)//2-th order
    * statistic — the cross-engine-safe percentile, see CLAUDE.md).
    * Reports the residual cell matrix with the accumulated row and
    * column effects riding along.
    *
    * Shape at 100TB: the matrix is (nations x months) — a dictionary.
    * One fact aggregate builds it; the sweeps run driver-side on the
    * collected 300-cell matrix (the KMeansFx codebook posture: state
    * is kilobytes, the plan stays constant). The oracle unrolls the
    * same sweeps as one MATERIALIZED CTE per half-step.
    */
  val medianPolish: Q = {
    def rowStep(k: Int, in: String): String =
      s"""rm$k AS MATERIALIZED (SELECT nk, v FROM (SELECT nk, v,
         |    ROW_NUMBER() OVER (PARTITION BY nk ORDER BY v) AS rn,
         |    COUNT(*) OVER (PARTITION BY nk) AS c FROM $in) z
         |  WHERE rn = (c + 1) // 2),
         |cr$k AS MATERIALIZED (SELECT c.nk, c.mon, c.v - m.v AS v
         |  FROM $in c JOIN rm$k m ON m.nk = c.nk)""".stripMargin
    def colStep(k: Int, in: String): String =
      s"""cm$k AS MATERIALIZED (SELECT mon, v FROM (SELECT mon, v,
         |    ROW_NUMBER() OVER (PARTITION BY mon ORDER BY v) AS rn,
         |    COUNT(*) OVER (PARTITION BY mon) AS c FROM $in) z
         |  WHERE rn = (c + 1) // 2),
         |cc$k AS MATERIALIZED (SELECT c.nk, c.mon, c.v - m.v AS v
         |  FROM $in c JOIN cm$k m ON m.mon = c.mon)""".stripMargin
    val steps = (1 to PolishRounds).map { k =>
      rowStep(k, if (k == 1) "cells0" else s"cc${k - 1}") + ",\n" +
        colStep(k, s"cr$k")
    }.mkString(",\n")
    val rowEff = (1 to PolishRounds).map(k => s"rm$k.v").mkString(" + ")
    val colEff = (1 to PolishRounds).map(k => s"cm$k.v").mkString(" + ")
    val rmJoins = (1 to PolishRounds)
      .map(k => s"JOIN rm$k ON rm$k.nk = f.nk").mkString("\n")
    val cmJoins = (1 to PolishRounds)
      .map(k => s"JOIN cm$k ON cm$k.mon = f.mon").mkString("\n")
    Q(
      "q_median_polish",
      s"""WITH cells0 AS MATERIALIZED (SELECT
         |    CAST(c.c_nationkey AS BIGINT) AS nk,
         |    CAST(month(o.o_orderdate) AS BIGINT) AS mon,
         |    CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
         |      AS BIGINT) AS v
         |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
         |  GROUP BY 1, 2),
         |$steps
         |SELECT f.nk, f.mon, f.v AS resid,
         |  $rowEff AS row_eff,
         |  $colEff AS col_eff
         |FROM cc$PolishRounds f
         |$rmJoins
         |$cmJoins
         |ORDER BY f.nk, f.mon""".stripMargin) { (s, d) =>
      val cells = Tables.load(s, d, "orders")
        .join(Tables.load(s, d, "customer"),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey").cast("long").as("nk"),
          month(col("o_orderdate")).cast("long").as("mon"))
        .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
          .as("v"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // dictionary-sized driver sweeps (the KMeansFx codebook posture)
      def lowerMedian(vs: Seq[Long]): Long = {
        val sorted = vs.sorted
        sorted((sorted.length + 1) / 2 - 1)
      }
      var v = cells.map { case (nk, mon, x) => ((nk, mon), x) }.toMap
      val keys = cells.map { case (nk, mon, _) => (nk, mon) }
      val rowEffAcc = collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      val colEffAcc = collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for (_ <- 1 to PolishRounds) {
        keys.groupBy(_._1).foreach { case (nk, ks) =>
          val med = lowerMedian(ks.map(v))
          rowEffAcc(nk) += med
          ks.foreach(k => v += k -> (v(k) - med))
        }
        keys.groupBy(_._2).foreach { case (mon, ks) =>
          val med = lowerMedian(ks.map(v))
          colEffAcc(mon) += med
          ks.foreach(k => v += k -> (v(k) - med))
        }
      }
      import s.implicits._
      keys.sorted.map { case (nk, mon) =>
        (nk, mon, v((nk, mon)), rowEffAcc(nk), colEffAcc(mon))
      }.toSeq.toDF("nk", "mon", "resid", "row_eff", "col_eff")
        .orderBy("nk", "mon")
    }
  }

  val all: Seq[Q] = Seq(simpsonFlip, medianPolish)
}
