package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Wave 55 — assortment optimization: greedy maximum coverage ("which
  * k parts touch the most orders"), the classic (1-1/e) submodular
  * greedy, as k unrolled argmax-and-exclude rounds.
  */
object Wave55 {

  private val CoverK = 8

  /** Greedy max-coverage: pick $CoverK parts one at a time, each
    * round choosing the part covering the most still-uncovered
    * orders (part key breaking ties), then excising its orders.
    * Reports each pick's marginal gain, the running covered count,
    * and coverage ppm of all orders — non-increasing marginal gains
    * by submodularity (asserted in-spec).
    *
    * Shape at 100TB: the (order, part) incidence and the per-part
    * base counts materialize once; each round is one semi-join of the
    * incidence against the COVERED set (the coverage won so far — at
    * most the order set, usually far smaller), one part-keyed count
    * folded against the base counts, a 1-row argmax back. k bounded
    * rounds, no data-sized collect (the argmax row is the only
    * driver value).
    */
  val maxCoverage: Q = {
    def rounds: String = (1 to CoverK).map { k =>
      s"""cov$k AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS gain
         |  FROM inc JOIN unc${k - 1} u ON u.ok = inc.ok GROUP BY 1),
         |pick$k AS MATERIALIZED (SELECT pk, gain FROM cov$k
         |  ORDER BY gain DESC, pk LIMIT 1),
         |unc$k AS MATERIALIZED (SELECT u.ok FROM unc${k - 1} u
         |  WHERE NOT EXISTS (SELECT 1 FROM inc i, pick$k p
         |    WHERE i.ok = u.ok AND i.pk = p.pk))""".stripMargin
    }.mkString(",\n")
    val picksUnion = (1 to CoverK).map { k =>
      s"SELECT CAST($k AS BIGINT) AS round, pk, gain FROM pick$k"
    }.mkString("\nUNION ALL ")
    Q(
      "q_max_coverage",
      s"""WITH inc AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
         |    l_partkey AS pk FROM lineitem),
         |unc0 AS MATERIALIZED (SELECT DISTINCT ok FROM inc),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM unc0),
         |$rounds,
         |picks AS ($picksUnion),
         |run AS (SELECT round, pk, gain,
         |    CAST(SUM(gain) OVER (ORDER BY round
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS covered
         |  FROM picks)
         |SELECT r.round, r.pk AS partkey, r.gain, r.covered,
         |  r.covered * 1000000 // t.n AS coverage_ppm
         |FROM run r, tot t ORDER BY r.round""".stripMargin) { (s, d) =>
      // PLAIN localCheckpoint (r13, the q_graph_scc lesson): the
      // fresh-leaf createDataFrame rebuild pays an UnsafeRow -> Row ->
      // re-encode round-trip on every read, and the EDGE-sized
      // incidence frame is read once per greedy round; round refs are
      // few, so the snapshot-stats growth that wedged Boruvka does not
      // apply.
      def ckptLeaf(df: DataFrame): DataFrame = df.localCheckpoint(false)
      val inc = ckptLeaf(Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct())
      val total = inc.select("ok").distinct().count()
      // r15 (guide §2.3, shuffle/broadcast fewer bytes): the old loop
      // semi-joined the incidence against the UNCOVERED order set —
      // order-set-sized, rebroadcast every round while shrinking by
      // only the picked part's gain. Track the complement instead:
      // unc0 is exactly the incidence's order set, so
      //   gain_k(p) = |inc(p)| − |inc(p) ∩ covered_k|
      // with base(p) = |inc(p)| aggregated ONCE and covered_k the
      // union of picked parts' orders — bounded by the coverage the
      // greedy has actually won, never larger than the order set the
      // old loop shipped every round (and ~400 rows vs ~147k here).
      // Parts with gain 0 appear in the new argmax input (the old
      // semi-join dropped them) but can never win while any part
      // covers >= 1 uncovered order — same argmax, same (gain DESC,
      // pk ASC) tie-break, same picks; both formulations degenerate
      // only in the everything-covered case where the oracle's
      // LIMIT 1 row is empty too.
      val base = ckptLeaf(inc.groupBy("pk").agg(count(lit(1)).as("base")))
      var cov: DataFrame = null
      var covered = 0L
      val picks = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      for (k <- 1 to CoverK) {
        val gains =
          if (cov == null) base.select(col("pk"), col("base").as("gain"))
          else {
            val dec = inc.join(broadcast(cov), Seq("ok"), "left_semi")
              .groupBy("pk").agg(count(lit(1)).as("dec"))
            base.join(broadcast(dec), Seq("pk"), "left")
              .select(col("pk"),
                (col("base") - coalesce(col("dec"), lit(0L))).as("gain"))
          }
        val best = gains
          .agg(max(struct(col("gain"), (-col("pk")).as("npk"))).as("m"))
          .select(expr("-m.npk").as("pk"), col("m.gain").as("gain"))
          .collect()(0)
        val (pk, gain) = (best.getLong(0), best.getLong(1))
        covered += gain
        picks += ((k.toLong, pk, gain))
        val hit = inc.filter(col("pk") === pk).select("ok")
        cov = ckptLeaf(
          if (cov == null) hit else cov.unionAll(hit).distinct())
      }
      import s.implicits._
      var run = 0L
      picks.toSeq.map { case (k, pk, gain) =>
        run += gain
        (k, pk, gain, run, run * 1000000L / total)
      }.toDF("round", "partkey", "gain", "covered", "coverage_ppm")
        .orderBy("round")
    }
  }

  val all: Seq[Q] = Seq(maxCoverage)
}
