package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Exact.ms

/** Wave 63 — sequential-pattern support mining (PrefixSpan/SPAM-style
  * ordered-subsequence support at depth 2 and 3 over the event-type
  * alphabet — the "what do users do in what order" miner next to the
  * contiguous q_seq_pattern CEP matcher) and the Nelson-Aalen
  * cumulative hazard (the additive companion to q_survival_km's
  * product-limit curve — the two estimators every survival readout
  * reports together).
  */
object Wave63 {

  /** Ordered-subsequence support: a user supports (a → b) iff some a
    * occurrence precedes some b occurrence — equivalently
    * min_t(a) < max_t(b), so depth-2 support needs only the per-user
    * first/last occurrence table; depth-3 (a → b → c) needs one b
    * occurrence strictly inside (min_t(a), max_t(c)), checked by
    * joining the events back against the 25-row-per-user (a, c)
    * bracket frame. Supports are exact user counts with ppm shares of
    * the active-user base.
    *
    * Shape at 100TB: ONE aggregate collapses events to ≤ 5 rows per
    * user (type, first, last); both pattern grains are user-keyed
    * equi-joins with alphabet-bounded fan-out (25x / 25x·events-per-
    * user); outputs are alphabet-bounded dictionaries (25 + 125 rows
    * ceiling).
    */
  val seqSupport: Q = Q(
    "q_seq_support",
    """WITH e AS (SELECT user_id, event_type AS t, epoch_ms(ts) AS ms
      |  FROM events),
      |u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      |  FROM e),
      |ft AS (SELECT user_id, t, MIN(ms) AS f, MAX(ms) AS l
      |  FROM e GROUP BY 1, 2),
      |pr AS (SELECT a.t AS ta, b.t AS tb,
      |    CAST(COUNT(*) AS BIGINT) AS support
      |  FROM ft a JOIN ft b ON b.user_id = a.user_id
      |  WHERE a.f < b.l GROUP BY 1, 2),
      |br AS (SELECT a.user_id, a.t AS ta, c.t AS tc, a.f AS fa, c.l AS lc
      |  FROM ft a JOIN ft c ON c.user_id = a.user_id),
      |tr AS (SELECT ta, tb, tc, CAST(COUNT(*) AS BIGINT) AS support
      |  FROM (SELECT DISTINCT br.user_id, br.ta, e.t AS tb, br.tc
      |        FROM br JOIN e ON e.user_id = br.user_id
      |          AND e.ms > br.fa AND e.ms < br.lc) x
      |  GROUP BY 1, 2, 3)
      |SELECT kind, a, b, c, support,
      |  CAST(support * 1000000 // u.n_users AS BIGINT) AS support_ppm
      |FROM (
      |  SELECT 'pair' AS kind, ta AS a, tb AS b, '~' AS c, support FROM pr
      |  UNION ALL
      |  SELECT 'tri' AS kind, ta, tb, tc, support FROM tr) s, u
      |ORDER BY kind, a, b, c""".stripMargin) { (s, d) =>
    val e = Tables.load(s, d, "events")
      .select(col("user_id"), col("event_type").as("t"),
        ms(col("ts")).as("ms"))
    val u = e.agg(countDistinct(col("user_id")).as("n_users"))
    val ft = e.groupBy("user_id", "t")
      .agg(min(col("ms")).as("f"), max(col("ms")).as("l"))
    val pr = ft.as("a")
      .join(ft.as("b"), col("a.user_id") === col("b.user_id"))
      .filter(col("a.f") < col("b.l"))
      .groupBy(col("a.t").as("a"), col("b.t").as("b"))
      .agg(count(lit(1)).as("support"))
      .select(lit("pair").as("kind"), col("a"), col("b"), lit("~").as("c"),
        col("support"))
    val br = ft.as("a")
      .join(ft.as("c"), col("a.user_id") === col("c.user_id"))
      .select(col("a.user_id").as("uid"), col("a.t").as("ta"),
        col("c.t").as("tc"), col("a.f").as("fa"), col("c.l").as("lc"))
    val tr = br
      .join(e, col("user_id") === col("uid") &&
        col("ms") > col("fa") && col("ms") < col("lc"))
      .select(col("uid"), col("ta"), col("t").as("tb"), col("tc"))
      .distinct()
      .groupBy(col("ta").as("a"), col("tb").as("b"), col("tc").as("c"))
      .agg(count(lit(1)).as("support"))
      .select(lit("tri").as("kind"), col("a"), col("b"), col("c"),
        col("support"))
    pr.unionAll(tr)
      .crossJoin(broadcast(u))
      .select(col("kind"), col("a"), col("b"), col("c"), col("support"),
        expr("CAST(support * 1000000 div n_users AS BIGINT)")
          .as("support_ppm"))
      .orderBy("kind", "a", "b", "c")
  }

  /** Nelson-Aalen cumulative hazard over the same quarterly churn
    * frame as q_survival_km (Aalen 1978; the additive estimator
    * Fleming-Harrington builds on): per quarter-step k the hazard
    * term is d_k·1e6 div n_k and H_k is the running sum of terms —
    * both single truncating divisions, so the whole curve
    * hash-matches next to KM's product-limit chain.
    *
    * Shape at 100TB: one customer aggregate, one 1-row pivot, the
    * 8-step readout is generated arithmetic over that row.
    */
  val hazardNelsonAalen: Q = {
    def nK(k: Int) = (k to 7).flatMap(j => Seq(s"d$j", s"c$j")).mkString(" + ")
    def term(k: Int, div: String) =
      s"CASE WHEN n$k > 0 THEN (d$k * 1000000) $div n$k ELSE 0 END"
    def cum(k: Int, div: String) = (0 to k).map(term(_, div)).mkString(" + ")
    Q(
      "q_hazard_na", {
        val nDefs = (0 to 7).map(k => s"${nK(k)} AS n$k").mkString(",\n")
        s"""WITH o AS (SELECT o_custkey, epoch_ms(o_orderdate) // 86400000 AS day
           |           FROM orders),
           |m AS (SELECT MAX(day) AS mx FROM o),
           |cu AS (SELECT o_custkey, MIN(day) AS f, MAX(day) AS l FROM o GROUP BY 1),
           |cl AS (SELECT LEAST((l - f) // 91, 7) AS q, (m.mx - l) > 91 AS churn
           |       FROM cu, m),
           |pv AS (SELECT
           |  ${(0 to 7).map(k => s"COUNT(CASE WHEN churn AND q = $k THEN 1 END) AS d$k, COUNT(CASE WHEN NOT churn AND q = $k THEN 1 END) AS c$k").mkString(",\n  ")}
           |  FROM cl),
           |x AS (SELECT *, $nDefs FROM pv)
           |SELECT step, n_risk, d_events, h_term_ppm, h_cum_ppm FROM (
           |${(0 to 7).map(k =>
              s"  SELECT CAST($k AS BIGINT) AS step, CAST(n$k AS BIGINT) AS n_risk, d$k AS d_events, CAST(${term(k, "//")} AS BIGINT) AS h_term_ppm, CAST(${cum(k, "//")} AS BIGINT) AS h_cum_ppm FROM x")
              .mkString("\n  UNION ALL\n")})
           |ORDER BY step""".stripMargin
      }) { (s, d) =>
      val o = Tables.load(s, d, "orders").select(col("o_custkey"),
        graft.functions.Exact.bucket(ms(col("o_orderdate")), 86400000L)
          .as("day"))
      val m = o.agg(max(col("day")).as("mx"))
      val cl = o.groupBy("o_custkey")
        .agg(min(col("day")).as("f"), max(col("day")).as("l"))
        .crossJoin(broadcast(m))
        .select(least(expr("(l - f) div 91"), lit(7L)).as("q"),
          (col("mx") - col("l") > 91).as("churn"))
      val pv = cl.agg(
        (0 to 7).flatMap(k => Seq(
          count(when(col("churn") && col("q") === k, 1)).as(s"d$k"),
          count(when(!col("churn") && col("q") === k, 1)).as(s"c$k"))).head,
        (0 to 7).flatMap(k => Seq(
          count(when(col("churn") && col("q") === k, 1)).as(s"d$k"),
          count(when(!col("churn") && col("q") === k, 1)).as(s"c$k"))).tail: _*)
      val x = (0 to 7).foldLeft(pv)((df, k) =>
        df.withColumn(s"n$k", expr(nK(k))))
      val steps = (0 to 7).map { k =>
        x.select(lit(k.toLong).as("step"),
          col(s"n$k").cast("long").as("n_risk"),
          col(s"d$k").as("d_events"),
          expr(s"CAST(${term(k, "div")} AS BIGINT)").as("h_term_ppm"),
          expr(s"CAST(${cum(k, "div")} AS BIGINT)").as("h_cum_ppm"))
      }
      steps.reduce(_ unionAll _).orderBy("step")
    }
  }

  val all: Seq[Q] = Seq(seqSupport, hazardNelsonAalen)
}
