package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 51 — market-structure economics: the Laspeyres / Paasche /
  * Fisher price-index series over shipped parts by month, and
  * Herfindahl–Hirschman supplier-concentration per nation. Exact
  * integer index arithmetic; Fisher's geometric mean is the one
  * IEEE-exact sqrt over an exactly-constructed integer product.
  */
object Wave51 {

  /** Monthly price indices vs the January basket: realized unit price
    * per (part, month) in micro units — the exact integer revenue
    * form cents * (10000 - bps) over quantity, truncating (the TPC-H
    * Q3 idiom; no double products) — then for each month m over parts
    * priced in BOTH m and January:
    *   Laspeyres = Σ p_m q_1 / Σ p_1 q_1 (base-month weights),
    *   Paasche   = Σ p_m q_m / Σ p_1 q_m (current weights),
    *   Fisher    = sqrt(L * P), all in ppm.
    *
    * Shape at 100TB: one (part, month) aggregate, a self-join against
    * the broadcast January slice (part-dictionary-sized), one month
    * dictionary readout.
    */
  val fisherIndex: Q = Q(
    "q_price_index_fisher",
    """WITH pm AS (SELECT l_partkey AS pk,
      |    CAST(month(l_shipdate) AS BIGINT) AS mon,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q,
      |    CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
      |      * (10000 - CAST(ROUND(l_discount * 10000, 0) AS BIGINT)))
      |      AS BIGINT) AS rev_u
      |  FROM lineitem GROUP BY 1, 2),
      |up AS (SELECT pk, mon, q, rev_u // q AS p_u FROM pm),
      |base AS (SELECT pk, q AS q1, p_u AS p1 FROM up WHERE mon = 1),
      |j AS (SELECT u.mon, u.pk, u.q AS qm, u.p_u AS p_m,
      |    b.q1, b.p1
      |  FROM up u JOIN base b ON b.pk = u.pk WHERE u.mon <> 1),
      |ix AS (SELECT mon, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |    CAST(SUM(CAST(p_m AS HUGEINT) * q1) * 1000000
      |      // SUM(CAST(p1 AS HUGEINT) * q1) AS BIGINT) AS laspeyres_ppm,
      |    CAST(SUM(CAST(p_m AS HUGEINT) * qm) * 1000000
      |      // SUM(CAST(p1 AS HUGEINT) * qm) AS BIGINT) AS paasche_ppm
      |  FROM j GROUP BY 1)
      |SELECT mon, n_parts, laspeyres_ppm, paasche_ppm,
      |  CAST(FLOOR(SQRT(CAST(laspeyres_ppm * paasche_ppm AS DOUBLE)))
      |    AS BIGINT) AS fisher_ppm
      |FROM ix ORDER BY mon""".stripMargin) { (s, d) =>
    val pm = Tables.load(s, d, "lineitem")
      .groupBy(col("l_partkey").as("pk"),
        month(col("l_shipdate")).cast("long").as("mon"))
      .agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("q"),
        sum(expr("""CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                   | * (10000 - CAST(ROUND(l_discount * 10000, 0)
                   |     AS BIGINT))""".stripMargin)).as("rev_u"))
      .select(col("pk"), col("mon"), col("q"),
        expr("rev_u div q").as("p_u"))
    val base = pm.filter(col("mon") === 1)
      .select(col("pk"), col("q").as("q1"), col("p_u").as("p1"))
    // the January basket is part-grain (corpus-scaling): stats/AQE
    // decide — broadcast while small, shuffled pk equi-join at scale
    val j = pm.filter(col("mon") =!= 1)
      .join(base, Seq("pk"))
    j.groupBy("mon")
      .agg(count(lit(1)).as("n_parts"),
        sum(expr("CAST(p_u AS DECIMAL(38,0)) * q1")).as("l_num"),
        sum(expr("CAST(p1 AS DECIMAL(38,0)) * q1")).as("l_den"),
        sum(expr("CAST(p_u AS DECIMAL(38,0)) * q")).as("p_num"),
        sum(expr("CAST(p1 AS DECIMAL(38,0)) * q")).as("p_den"))
      .select(col("mon"), col("n_parts"),
        expr("CAST(l_num * 1000000 div l_den AS BIGINT)")
          .as("laspeyres_ppm"),
        expr("CAST(p_num * 1000000 div p_den AS BIGINT)")
          .as("paasche_ppm"))
      .select(col("mon"), col("n_parts"), col("laspeyres_ppm"),
        col("paasche_ppm"),
        expr("""CAST(FLOOR(SQRT(CAST(laspeyres_ppm * paasche_ppm
               |  AS DOUBLE))) AS BIGINT)""".stripMargin).as("fisher_ppm"))
      .orderBy("mon")
  }

  /** HHI supplier concentration per nation: each supplier's share of
    * its nation's shipped revenue, HHI = Σ share² in ppm of the
    * squared unit (0..1e6·1e6 rescaled to ppm) — cross-multiplied
    * exact: HHI_ppm = Σ s_i² * 1e6 // T². Flags concentrated markets
    * (HHI > 0.25).
    *
    * Shape at 100TB: one supplier-keyed fact aggregate, one
    * nation-keyed re-aggregate of the supplier dictionary — both
    * map-side combinable, no second fact scan.
    */
  val hhi: Q = Q(
    "q_hhi_concentration",
    """WITH sr AS (SELECT s.s_nationkey AS nk, l.l_suppkey AS sk,
      |    CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS rev_c
      |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  GROUP BY 1, 2),
      |n AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_supp,
      |    CAST(SUM(rev_c) AS BIGINT) AS tot_c,
      |    SUM(CAST(rev_c AS HUGEINT) * rev_c) AS ss
      |  FROM sr GROUP BY 1)
      |SELECT CAST(nk AS BIGINT) AS nationkey, n_supp, tot_c,
      |  CAST(ss * 1000000 // (CAST(tot_c AS HUGEINT) * tot_c)
      |    AS BIGINT) AS hhi_ppm,
      |  CASE WHEN ss * 4 > CAST(tot_c AS HUGEINT) * tot_c
      |    THEN 1 ELSE 0 END AS concentrated
      |FROM n ORDER BY nationkey""".stripMargin) { (s, d) =>
    val sr = Tables.load(s, d, "lineitem")
      .join(Tables.load(s, d, "supplier"),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_nationkey").as("nk"), col("l_suppkey").as("sk"))
      .agg(sum(expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"))
        .as("rev_c"))
    sr.groupBy("nk")
      .agg(count(lit(1)).as("n_supp"), sum("rev_c").as("tot_c"),
        sum(expr("CAST(rev_c AS DECIMAL(38,0)) * rev_c")).as("ss"))
      .select(col("nk").cast("long").as("nationkey"), col("n_supp"),
        col("tot_c"),
        expr("""CAST(ss * 1000000 div (CAST(tot_c AS DECIMAL(38,0))
               |  * tot_c) AS BIGINT)""".stripMargin).as("hhi_ppm"),
        when(expr("ss * 4 > CAST(tot_c AS DECIMAL(38,0)) * tot_c"), 1L)
          .otherwise(0L).as("concentrated"))
      .orderBy("nationkey")
  }

  val all: Seq[Q] = Seq(fisherIndex, hhi)
}
