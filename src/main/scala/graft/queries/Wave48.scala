package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 48 — nonparametric k-sample tests: Kruskal–Wallis across the
  * five market segments (global spend ranks) and Friedman across
  * nations blocked by calendar month. Ranks are made total by the
  * entity key (a deterministic metric definition — no midrank tie
  * convention to disagree on); statistics in truncating micro units
  * with DECIMAL(38)/HUGEINT intermediates.
  */
object Wave48 {

  /** Kruskal–Wallis H across market segments on customer lifetime
    * spend: every customer gets a global spend rank, segments get
    * rank sums, and H_micro = 12e6 * sum(R_j^2/n_j) / (N(N+1))
    * - 3e6*(N+1) with the per-group quotient floor'd (defined
    * metric). Each segment row reports its rank sum and mean-rank
    * against the grand mean (N+1)/2, with H riding along.
    *
    * Shape at 100TB: the global rank is a [[graft.ops.RankedPrefix]]
    * two-phase prefix sum (never a single-partition window); the
    * rest is a five-row dictionary readout.
    */
  val kruskalWallis: Q = Q(
    "q_kruskal_wallis",
    """WITH cu AS (SELECT o_custkey AS ck,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |r AS (SELECT cu.ck, c.c_mktsegment AS seg,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cu.cents, cu.ck) AS BIGINT)
      |      AS rk
      |  FROM cu JOIN customer c ON c.c_custkey = cu.ck),
      |g AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_j,
      |    CAST(SUM(rk) AS BIGINT) AS rank_sum
      |  FROM r GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_j) AS BIGINT) AS n,
      |    CAST(SUM(CAST(rank_sum AS HUGEINT) * rank_sum * 1000000
      |      // n_j) AS HUGEINT) AS a
      |  FROM g)
      |SELECT g.seg, g.n_j, g.rank_sum,
      |  g.rank_sum * 2000000 // g.n_j - (t.n + 1) * 1000000
      |    AS mean_rank_excess_2e6,
      |  CAST(12 * t.a // (CAST(t.n AS HUGEINT) * (t.n + 1))
      |    - 3000000 * (t.n + 1) AS BIGINT) AS h_micro
      |FROM g, t ORDER BY g.seg""".stripMargin) { (s, d) =>
    import graft.ops.RankedPrefix
    val cu = Tables.load(s, d, "orders")
      .groupBy(col("o_custkey").as("ck"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val seg = cu.join(Tables.load(s, d, "customer")
        .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg")),
      Seq("ck"))
    val ranked = RankedPrefix.rankedCumsum(
      seg, RankedPrefix.logBucket(col("cents")), bucketDesc = false,
      order = Seq(col("cents"), col("ck")), rankCol = Some("rk")).df
    val g = ranked.groupBy("seg")
      .agg(count(lit(1)).as("n_j"), sum("rk").as("rank_sum"))
    val t = g.agg(sum("n_j").as("n"),
      sum(expr("CAST(rank_sum AS DECIMAL(38,0)) * rank_sum * 1000000"
        + " div n_j")).as("a"))
    g.crossJoin(broadcast(t))
      .select(col("seg"), col("n_j"), col("rank_sum"),
        expr("rank_sum * 2000000 div n_j - (n + 1) * 1000000")
          .as("mean_rank_excess_2e6"),
        expr("""CAST(12 * a div (CAST(n AS DECIMAL(38,0)) * (n + 1))
               |  - 3000000 * (n + 1) AS BIGINT)""".stripMargin)
          .as("h_micro"))
      .orderBy("seg")
  }

  /** Friedman test: nations ranked within each calendar month by
    * monthly revenue (nation key breaking ties), rank totals per
    * nation, Q_micro = 12e6 * sum(R_j^2) / (n*k*(k+1)) - 3e6*n*(k+1)
    * over n month blocks and k nations. Only nations present in
    * EVERY month enter (the test requires complete blocks); each
    * nation row reports its rank total with Q riding along.
    *
    * Shape at 100TB: one fact aggregate to the (nation x month)
    * dictionary; month-partitioned rank windows; dictionary-sized
    * arithmetic after.
    */
  val friedman: Q = Q(
    "q_friedman_test",
    """WITH nm AS (SELECT c.c_nationkey AS nk,
      |    CAST(month(o.o_orderdate) AS BIGINT) AS mon,
      |    CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2),
      |mons AS (SELECT CAST(COUNT(DISTINCT mon) AS BIGINT) AS n_mon
      |  FROM nm),
      |full_n AS (SELECT nk FROM nm, mons GROUP BY nk, n_mon
      |  HAVING COUNT(*) = n_mon),
      |rk AS (SELECT f.nk, n.mon,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY n.mon
      |      ORDER BY n.cents, n.nk) AS BIGINT) AS r
      |  FROM nm n JOIN full_n f ON f.nk = n.nk),
      |rj AS (SELECT nk, CAST(SUM(r) AS BIGINT) AS rank_total
      |  FROM rk GROUP BY 1),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |    CAST(SUM(CAST(rank_total AS HUGEINT) * rank_total)
      |      AS HUGEINT) AS sr2,
      |    (SELECT n_mon FROM mons) AS n_blocks
      |  FROM rj)
      |SELECT rj.nk AS nation, rj.rank_total, t.n_blocks, t.k,
      |  CAST(12 * t.sr2 * 1000000
      |    // (CAST(t.n_blocks AS HUGEINT) * t.k * (t.k + 1))
      |    - 3000000 * t.n_blocks * (t.k + 1) AS BIGINT) AS q_micro
      |FROM rj, t ORDER BY rj.nk""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val nm = Tables.load(s, d, "orders")
      .join(Tables.load(s, d, "customer"),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nk"),
        month(col("o_orderdate")).cast("long").as("mon"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"))
        .as("cents"))
    val mons = nm.agg(countDistinct("mon").as("n_mon"))
    val fullN = nm.crossJoin(broadcast(mons))
      .groupBy("nk", "n_mon").agg(count(lit(1)).as("c"))
      .filter(col("c") === col("n_mon")).select("nk")
    val wMon = Window.partitionBy("mon").orderBy(col("cents"), col("nk"))
    val rk = nm.join(broadcast(fullN), Seq("nk"))
      .withColumn("r", row_number().over(wMon).cast("long"))
    val rj = rk.groupBy("nk").agg(sum("r").as("rank_total"))
    val t = rj.agg(count(lit(1)).as("k"),
        sum(expr("CAST(rank_total AS DECIMAL(38,0)) * rank_total"))
          .as("sr2"))
      .crossJoin(broadcast(mons.select(col("n_mon").as("n_blocks"))))
    rj.crossJoin(broadcast(t))
      .select(col("nk").as("nation"), col("rank_total"),
        col("n_blocks"), col("k"),
        expr("""CAST(12 * sr2 * 1000000
               |  div (CAST(n_blocks AS DECIMAL(38,0)) * k * (k + 1))
               |  - 3000000 * n_blocks * (k + 1) AS BIGINT)"""
          .stripMargin).as("q_micro"))
      .orderBy("nation")
  }

  val all: Seq[Q] = Seq(kruskalWallis, friedman)
}
