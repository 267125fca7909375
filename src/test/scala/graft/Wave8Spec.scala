package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the round-8 additions: exact-integer statistics
  * (OLS / Pearson), CEP sequence matching, sparse retrieval, the
  * portable HLL, IVF recall, and the A/B readout. Each query also
  * carries a full DuckDB hash oracle; these tests pin the ALGEBRA
  * (bounds, identities, independent recomputation) that a hash match
  * alone would not explain.
  */
class Wave8Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_regression_group slope matches an independent BigInt recompute " +
    "for every nation") {
    val rows = graft.queries.Analytics.regressionGroup
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    // Recompute the moments from raw tables with BigInt arithmetic.
    val cust = Tables.load(spark, SharedSpark.sf001, "customer")
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cells = Tables.load(spark, SharedSpark.sf001, "orders")
      .select(col("o_custkey"), unix_millis(col("o_orderdate")).as("ms"),
        floor(col("o_totalprice").cast("decimal(18,2)")).cast("long").as("y"))
      .collect()
      .map(r => ((cust(r.getLong(0)), r.getLong(1) / 86400000L / 30L - 300L),
        r.getLong(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    rows.foreach { r =>
      val nk = r.getInt(0)
      val pts = cells.collect { case ((`nk`, x), y) => (BigInt(x), BigInt(y)) }
      val n = BigInt(pts.size)
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val (sxx, sxy) = (pts.map(p => p._1 * p._1).sum,
        pts.map(p => p._1 * p._2).sum)
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      assert(BigInt(r.getLong(2)) == num, s"nation $nk slope_num")
      assert(BigInt(r.getLong(3)) == den, s"nation $nk slope_den")
      assert(BigInt(r.getLong(4)) == num.sign * (num.abs * 1000 / den),
        s"nation $nk slope_e3")
    }
  }

  test("q_corr_exact is bounded by 1e6 and matches a BigInt recompute") {
    val rows = graft.queries.Analytics.corrExact
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    val raw = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select(col("l_suppkey"), col("l_quantity").cast("long"),
        floor(col("l_extendedprice").cast("decimal(18,2)")).cast("long"))
      .collect().map(r => (r.getLong(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
      .groupBy(_._1)
    rows.foreach { r =>
      val c2 = r.getLong(3)
      assert(c2 >= 0 && c2 <= 1000000, s"corr2_e6 out of [0,1e6]: $c2")
      val pts = raw(r.getLong(0)).map(t => (t._2, t._3))
      val n = BigInt(pts.size)
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val num = n * pts.map(p => p._1 * p._2).sum - sx * sy
      val d1 = n * pts.map(p => p._1 * p._1).sum - sx * sx
      val d2 = n * pts.map(p => p._2 * p._2).sum - sy * sy
      assert(BigInt(c2) == num * num * 1000000 / (d1 * d2))
      assert(r.getLong(2) == num.sign.toLong)
    }
  }

  test("q_corr_exact reads 1e6 exactly on a perfectly linear relation") {
    // y = 3x + 7 over any x spread has r^2 = 1; feed the same SQL
    // expression chain a tiny constructed frame via the oracle algebra.
    val pts = Seq((1L, 10L), (2L, 13L), (5L, 22L), (9L, 34L))
      .map { case (x, y) => (BigInt(x), BigInt(y)) }
    val n = BigInt(pts.size)
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val num = n * pts.map(p => p._1 * p._2).sum - sx * sy
    val d1 = n * pts.map(p => p._1 * p._1).sum - sx * sx
    val d2 = n * pts.map(p => p._2 * p._2).sum - sy * sy
    assert(num * num * 1000000 / (d1 * d2) == BigInt(1000000))
  }

  test("q_seq_pattern counts and positions match a string recompute " +
    "per user") {
    val rows = graft.queries.Analytics.seqPattern
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    val seqs = Tables.load(spark, SharedSpark.sf001, "events")
      .select(col("user_id"), unix_millis(col("ts").cast("timestamp")).as("ms"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getString(3).substring(0, 1))))
      .groupBy(_._1)
      .map { case (u, es) =>
        u -> es.map(_._2).sortBy(e => (e._1, e._2)).map(_._3).mkString
      }
    def nonOverlapping(s: String, pat: String): Long = {
      var (i, c) = (0, 0L)
      var j = s.indexOf(pat, i)
      while (j >= 0) { c += 1; i = j + pat.length; j = s.indexOf(pat, i) }
      c
    }
    rows.foreach { r =>
      val seq = seqs(r.getLong(0))
      assert(r.getString(2) == seq, s"user ${r.getLong(0)} seq")
      assert(r.getLong(3) == nonOverlapping(seq, "vcp"))
      assert(r.getLong(4) == (seq.indexOf("vcp") + 1).toLong)
    }
    assert(rows.map(_.getLong(3)).sum > 0, "pattern never fires — vacuous")
  }

  test("q_sparse_cosine similarities respect Cauchy-Schwarz and rank order") {
    val rows = graft.queries.TextQueries.sparseCosine
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (probe, rs) =>
      val byRank = rs.sortBy(_.getAs[Number]("rank").longValue)
      assert(byRank.map(_.getAs[Number]("rank").longValue).toSeq
        == (1L to byRank.length).toSeq,
        s"probe $probe ranks not dense")
      val sims = byRank.map(_.getLong(3))
      assert(sims.forall(s => s >= 0 && s <= 1000000000L),
        s"probe $probe sim2_e9 outside [0, 1e9]")
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"probe $probe not sorted by similarity")
    }
  }

  test("q_sketch_hll_fx estimates stay inside 4 standard errors, and " +
    "merging monthly registers equals building yearly registers directly") {
    val rows = graft.queries.Analytics.hllFx
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    // 1.04/sqrt(256) = 6.5% relative standard error; 4 sigma = 26%.
    rows.foreach { r =>
      val (est, exact) = (r.getLong(2), r.getLong(3))
      assert(est > 0)
      assert(math.abs(est - exact).toDouble / exact <= 0.26,
        s"yr ${r.getLong(0)}: est=$est exact=$exact drifts past 4 sigma")
    }
    // Mergeability: registers built straight at year grain (no month
    // stage) must produce the identical harmonic sums.
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
    val direct = li.select(year(col("l_shipdate")).cast("long").as("yr"),
        md5(col("l_orderkey").cast("string").cast("binary")).as("h"))
      .distinct()
      .select(col("yr"),
        expr("CAST(conv(substr(h, 1, 2), 16, 10) AS BIGINT)").as("reg"),
        expr("""CASE WHEN CAST(conv(substr(h, 3, 12), 16, 10) AS BIGINT) = 0 THEN 49L
               |ELSE 49L - length(bin(CAST(conv(substr(h, 3, 12), 16, 10) AS BIGINT)))
               |END""".stripMargin).as("r"))
      .groupBy("yr", "reg").agg(max(col("r")).as("mr"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val viaMonths = li.select(year(col("l_shipdate")).cast("long").as("yr"),
        trunc(to_date(col("l_shipdate")), "month").as("mon"),
        md5(col("l_orderkey").cast("string").cast("binary")).as("h"))
      .distinct()
      .select(col("yr"), col("mon"),
        expr("CAST(conv(substr(h, 1, 2), 16, 10) AS BIGINT)").as("reg"),
        expr("""CASE WHEN CAST(conv(substr(h, 3, 12), 16, 10) AS BIGINT) = 0 THEN 49L
               |ELSE 49L - length(bin(CAST(conv(substr(h, 3, 12), 16, 10) AS BIGINT)))
               |END""".stripMargin).as("r"))
      .groupBy("yr", "mon", "reg").agg(max(col("r")).as("mr"))
      .groupBy("yr", "reg").agg(max(col("mr")).as("mr"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(direct == viaMonths, "month-merged registers != direct registers")
  }

  test("q_ann_recall hit counts are bounded by k, derive recall_pct, " +
    "and at least one probe recovers a true neighbor") {
    val rows = graft.queries.DedupSim.annRecall
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (hits, pct) = (r.getLong(1), r.getLong(2))
      assert(hits >= 0 && hits <= 10)
      assert(pct == hits * 10)
    }
    assert(rows.map(_.getLong(1)).sum > 0, "IVF recovered nothing — vacuous")
  }

  test("q_ab_lift arms partition the users and the rational lift is " +
    "consistent with the counts") {
    val r = graft.queries.Analytics.abLift
      .run(spark, SharedSpark.sf001).collect().head
    val (nA, cA, nB, cB) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = Tables.load(spark, SharedSpark.sf001, "events")
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(nA + nB == users)
    assert(cA >= 0 && cA <= nA && cB >= 0 && cB <= nB)
    assert(r.getLong(4) == cA * nB - cB * nA)
    assert(r.getLong(5) == nA * nB)
    assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite)
  }
}
