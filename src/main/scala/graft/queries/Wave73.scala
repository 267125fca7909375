package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Wave 73 — q_graph_richclub: rich-club coefficients of the shared
  * co-purchase graph (Zhou & Mondragón 2004; Colizza et al. 2006):
  * for each degree threshold k, φ(k) = 2·E_k / (N_k·(N_k−1)) over the
  * subgraph of nodes with degree > k — whether the hubs wire to each
  * other (the assortativity companion readout). And q_ab_srm: the
  * sample-ratio-mismatch chi-square guardrail (Fabijan et al. 2019 —
  * the first test every experimentation platform runs): per cohort,
  * are the md5-assigned arms consistent with the intended 50/50
  * split? chi² for two cells = (n_a−n_b)²/n, carried in exact micro.
  */
object Wave73 {

  /** The threshold ladder — fixed powers of two, both engines. */
  private val Ks = Seq(1L, 2L, 4L, 8L, 16L, 32L)

  /** q_graph_richclub.
    *
    * Shape at 100TB: degrees are one aggregate over the shared edge
    * cache; the ladder is a 6-row literal broadcast; E_k folds from
    * ONE pass over edges joined to the degree table once per endpoint
    * (equi-joins, stats/AQE-decided sides — deg is node-grain,
    * corpus-scaling, so never force-broadcast). */
  val graphRichclub: Q = Q(
    "q_graph_richclub",
    s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |deg AS MATERIALIZED (SELECT x, CAST(COUNT(*) AS BIGINT) AS d FROM
       |  (SELECT u AS x FROM e UNION ALL SELECT v FROM e) z GROUP BY 1),
       |ks AS (SELECT CAST(unnest([${Ks.mkString(", ")}]) AS BIGINT) AS k),
       |nk AS (SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS n_k
       |  FROM ks JOIN deg ON deg.d > ks.k GROUP BY 1),
       |ek AS (SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS e_k
       |  FROM ks CROSS JOIN e
       |  JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
       |  WHERE du.d > ks.k AND dv.d > ks.k GROUP BY 1)
       |SELECT ks.k, COALESCE(nk.n_k, 0) AS n_k, COALESCE(ek.e_k, 0) AS e_k,
       |  CASE WHEN COALESCE(nk.n_k, 0) >= 2 THEN
       |    CAST(CAST(2 * COALESCE(ek.e_k, 0) AS HUGEINT) * 1000000
       |         // (CAST(nk.n_k AS HUGEINT) * (nk.n_k - 1)) AS BIGINT)
       |  END AS phi_ppm
       |FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN ek ON ek.k = ks.k
       |ORDER BY ks.k""".stripMargin) { (s, d) =>
    import s.implicits._
    val e = GraphShared.pairs(s, d).select("u", "v")
    val deg = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val ks = Ks.toDF("k")
    val nk = deg.crossJoin(broadcast(ks))
      .filter(col("d") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_k"))
    val ek = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .crossJoin(broadcast(ks))
      .filter(col("du") > col("k") && col("dv") > col("k"))
      .groupBy("k").agg(count(lit(1)).as("e_k"))
    ks.join(nk, Seq("k"), "left").join(ek, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("n_k"), lit(0L)).as("n_k"),
        coalesce(col("e_k"), lit(0L)).as("e_k"))
      .withColumn("phi_ppm",
        expr("""CASE WHEN n_k >= 2 THEN
               |  CAST(CAST(2 * e_k AS DECIMAL(38,0)) * 1000000
               |       div (CAST(n_k AS DECIMAL(38,0)) * (n_k - 1))
               |       AS BIGINT)
               |END""".stripMargin))
      .orderBy("k")
  }

  /** q_ab_srm: per-event-type cohorts of DISTINCT users, arms from the
    * md5 gate (the q_ab_lift assignment), chi² against the intended
    * 50/50 in exact micro — (n_a−n_b)²·1e6 div n in the 38-digit lane
    * (the squared diff outgrows BIGINT once a cohort passes ~3e9
    * users) — and the 0.05-critical flag (3.841·1e6, exact literal).
    *
    * Shape at 100TB: one distinct-user aggregate per cohort (map-side
    * combined), arithmetic on the event-type dictionary. */
  val abSrm: Q = Q(
    "q_ab_srm",
    """WITH u AS (SELECT DISTINCT event_type, user_id,
      |    CASE WHEN md5(CAST(user_id AS VARCHAR)) < '80'
      |         THEN 1 ELSE 0 END AS in_a
      |  FROM events),
      |s AS (SELECT event_type,
      |    CAST(SUM(in_a) AS BIGINT) AS n_a,
      |    CAST(SUM(1 - in_a) AS BIGINT) AS n_b
      |  FROM u GROUP BY 1)
      |SELECT event_type, n_a, n_b,
      |  CAST(CAST(n_a - n_b AS HUGEINT) * (n_a - n_b) * 1000000
      |       // (n_a + n_b) AS BIGINT) AS chi2_micro,
      |  CAST(CASE WHEN CAST(n_a - n_b AS HUGEINT) * (n_a - n_b) * 1000000
      |                 // (n_a + n_b) > 3841459 THEN 1 ELSE 0 END
      |    AS BIGINT) AS srm_flag
      |FROM s ORDER BY event_type""".stripMargin) { (s, d) =>
    val u = Tables.load(s, d, "events")
      .select(col("event_type"), col("user_id"),
        when(md5(col("user_id").cast("string").cast("binary")) < "80", 1L)
          .otherwise(0L).as("in_a"))
      .distinct()
    u.groupBy("event_type")
      .agg(sum(col("in_a")).as("n_a"), sum(lit(1L) - col("in_a")).as("n_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        expr("""CAST(CAST(n_a - n_b AS DECIMAL(38,0)) * (n_a - n_b)
               |     * 1000000 div (n_a + n_b) AS BIGINT)"""
          .stripMargin).as("chi2_micro"),
        expr("""CAST(CASE WHEN CAST(n_a - n_b AS DECIMAL(38,0)) * (n_a - n_b)
               |               * 1000000
               |               div (n_a + n_b) > 3841459 THEN 1 ELSE 0 END
               |  AS BIGINT)""".stripMargin).as("srm_flag"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(graphRichclub, abSrm)
}
