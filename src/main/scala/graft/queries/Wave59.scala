package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 59 — spectral seasonality detection (an integer periodogram
  * over the daily revenue series: which candidate cycle carries the
  * energy?) and functional-dependency discovery (the g3-error FD
  * audit schema-inference and data-quality tools run before trusting
  * a column as a key).
  *
  * Determinism: the trig tables are Scala-generated integer literals
  * embedded in BOTH the engine plan and the oracle SQL (the
  * q_benford_digits precedent — no libm at query time); everything
  * else is BIGINT/HUGEINT products and truncating divisions.
  */
object Wave59 {

  /** Candidate cycle lengths in days (weekly / monthly / quarterly). */
  private val Periods = Seq(7, 30, 91)

  /** (period, phase, cos*1e4, sin*1e4) — generated ONCE here; the
    * engine broadcasts it as a local relation and the oracle embeds it
    * as a VALUES list, so the tables cannot drift. */
  private val Trig: Seq[(Int, Int, Long, Long)] = Periods.flatMap { p =>
    (0 until p).map { k =>
      (p, k, math.round(math.cos(2 * math.Pi * k / p) * 10000),
        math.round(math.sin(2 * math.Pi * k / p) * 10000))
    }
  }

  /** Integer periodogram: single-frequency DFT power at each candidate
    * period over the (observed-day, integer-mean-centered) daily
    * revenue series —
    *   a_P = Σ_t rc_t·cos(2π(t mod P)/P)·1e4   (BIGINT exact)
    *   b_P = Σ_t rc_t·sin(...)                  power = a² + b²
    * with the energy SHARE across candidates in ppm and the dominant
    * period flagged — the "does this metric have a weekly cycle"
    * question every seasonality-aware forecast asks first (the
    * frequency-domain companion to q_seasonality_how / q_ts_acf).
    *
    * Shape at 100TB: the fact table collapses to per-day sums once
    * (map-side combine); the day series fans out 3x to the candidate
    * periods and equi-joins the broadcast 128-row trig table on
    * (period, phase); everything after is arithmetic on 3 rows.
    */
  val tsPeriodogram: Q = {
    val values = Trig.map { case (p, k, c, s) => s"($p, $k, $c, $s)" }
      .mkString(", ")
    Q(
      "q_ts_periodogram",
      s"""WITH tg(p, k, c, s) AS (VALUES $values),
         |d AS (SELECT epoch_ms(o_orderdate) // 86400000 AS day,
         |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
         |      AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
         |    CAST(SUM(cents) AS BIGINT) AS tot FROM d),
         |ctr AS (SELECT day, cents - (st.tot // st.nd) AS rc FROM d, st),
         |f AS (SELECT ctr.day, ctr.rc, pp.p, ctr.day % pp.p AS k
         |  FROM ctr CROSS JOIN (SELECT DISTINCT p FROM tg) pp),
         |j AS (SELECT f.p, CAST(SUM(f.rc * tg.c) AS BIGINT) AS a,
         |    CAST(SUM(f.rc * tg.s) AS BIGINT) AS b
         |  FROM f JOIN tg ON tg.p = f.p AND tg.k = f.k GROUP BY 1),
         |pw AS (SELECT p, a, b,
         |    CAST(a AS HUGEINT) * a + CAST(b AS HUGEINT) * b AS p2 FROM j),
         |tt AS (SELECT SUM(p2) AS t2, MAX(p2) AS mx FROM pw)
         |SELECT CAST(pw.p AS BIGINT) AS period, pw.a, pw.b,
         |  CAST(pw.p2 * 1000000 // tt.t2 AS BIGINT) AS power_ppm,
         |  CAST(CASE WHEN pw.p2 = tt.mx THEN 1 ELSE 0 END AS BIGINT)
         |    AS dominant,
         |  st.nd AS n_days
         |FROM pw, tt, st ORDER BY period""".stripMargin) { (s, d) =>
      import graft.functions.Exact
      val trig = {
        import s.implicits._
        Trig.toDF("p", "k", "c", "s")
      }
      val days = Tables.load(s, d, "orders")
        .groupBy(Exact.bucket(Exact.ms(col("o_orderdate")), 86400000L)
          .as("day"))
        .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
          .as("cents"))
      val st = days.agg(count(lit(1)).as("nd"),
        sum(col("cents")).cast("long").as("tot"))
      val ctr = days.crossJoin(broadcast(st))
        .withColumn("rc", col("cents") - expr("tot div nd"))
      val f = ctr
        .withColumn("p", explode(array(Periods.map(lit): _*)))
        .withColumn("k", (col("day") % col("p")).cast("int"))
      val j = f.join(broadcast(trig), Seq("p", "k"))
        .groupBy("p")
        .agg(sum(col("rc") * col("c")).cast("long").as("a"),
          sum(col("rc") * col("s")).cast("long").as("b"))
      val pw = j.withColumn("p2",
        expr("CAST(a AS DECIMAL(38,0)) * a + CAST(b AS DECIMAL(38,0)) * b"))
      val tt = pw.agg(sum(col("p2")).as("t2"), max(col("p2")).as("mx"))
      pw.crossJoin(broadcast(tt)).crossJoin(broadcast(st))
        .select(col("p").cast("long").as("period"), col("a"), col("b"),
          expr("CAST(p2 * 1000000 div t2 AS BIGINT)").as("power_ppm"),
          expr("CAST(CASE WHEN p2 = mx THEN 1 ELSE 0 END AS BIGINT)")
            .as("dominant"),
          col("nd").cast("long").as("n_days"))
        .orderBy("period")
    }
  }

  /** FD candidates: (label, table, determinant, dependent). A mix of
    * true keys and plausible-but-false dependencies so the audit
    * exercises both verdicts at every SF. */
  private val Fds: Seq[(String, String, String, String)] = Seq(
    ("customer:c_nationkey->c_mktsegment", "customer", "c_nationkey",
      "c_mktsegment"),
    ("lineitem:l_orderkey->l_returnflag", "lineitem", "l_orderkey",
      "l_returnflag"),
    ("lineitem:l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
    ("orders:o_custkey->o_orderpriority", "orders", "o_custkey",
      "o_orderpriority"),
    ("orders:o_orderkey->o_orderstatus", "orders", "o_orderkey",
      "o_orderstatus"),
    ("part:p_brand->p_type", "part", "p_brand", "p_type"))

  /** Functional-dependency discovery (Kivinen & Mannila's g3 error —
    * the measure TANE/FDep-style profilers report): for each candidate
    * X -> Y, the minimum rows to delete so the FD holds is
    * n_rows − Σ_x max_y count(x, y); the audit reports key counts,
    * violating-key counts, g3 in rows and ppm, and the holds verdict —
    * the "can I trust this column as a key / is this denormalization
    * consistent" primitive of schema inference over raw training data.
    *
    * Shape at 100TB: per candidate ONE map-side-combined (X, Y)
    * aggregate is the only data-sized work (keyed on the candidate's
    * determinant); the per-key fold and the one-row readout are
    * key-grain. Candidates are independent branches of a union — on a
    * cluster they run concurrently.
    */
  val fdDiscovery: Q = {
    def branchSql(name: String, t: String, lhs: String, rhs: String) =
      s"""SELECT '$name' AS fd, CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_viol_keys,
         |  CAST(SUM(cnt) - SUM(mx) AS BIGINT) AS g3_rows,
         |  CAST((SUM(cnt) - SUM(mx)) * 1000000 // SUM(cnt) AS BIGINT)
         |    AS g3_ppm,
         |  CAST(CASE WHEN SUM(cnt) = SUM(mx) THEN 1 ELSE 0 END AS BIGINT)
         |    AS holds
         |FROM (SELECT lhs, COUNT(*) AS nrhs, SUM(c) AS cnt, MAX(c) AS mx
         |  FROM (SELECT $lhs AS lhs, $rhs AS rhs, COUNT(*) AS c
         |        FROM $t GROUP BY 1, 2) pc
         |  GROUP BY 1) pk""".stripMargin
    Q(
      "q_fd_discovery",
      Fds.map { case (n, t, l, r) => branchSql(n, t, l, r) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY fd")) { (s, d) =>
      val branches = Fds.map { case (name, t, lhs, rhs) =>
        val pc = Tables.load(s, d, t)
          .groupBy(col(lhs).as("lhs"), col(rhs).as("rhs"))
          .agg(count(lit(1)).as("c"))
        val pk = pc.groupBy("lhs")
          .agg(count(lit(1)).as("nrhs"), sum(col("c")).as("cnt"),
            max(col("c")).as("mx"))
        pk.agg(
          sum(col("cnt")).cast("long").as("n_rows"),
          count(lit(1)).as("n_keys"),
          sum(when(col("nrhs") > 1, 1L).otherwise(0L)).cast("long")
            .as("n_viol_keys"),
          (sum(col("cnt")) - sum(col("mx"))).cast("long").as("g3_rows"))
          .select(lit(name).as("fd"), col("n_rows"), col("n_keys"),
            col("n_viol_keys"), col("g3_rows"),
            expr("g3_rows * 1000000 div n_rows").as("g3_ppm"),
            when(col("g3_rows") === 0L, 1L).otherwise(0L).as("holds"))
      }
      branches.reduce(_ unionAll _).orderBy("fd")
    }
  }

  val all: Seq[Q] = Seq(tsPeriodogram, fdDiscovery)
}
