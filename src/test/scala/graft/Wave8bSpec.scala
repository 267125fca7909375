package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the round-8 second wave: estimator calibration,
  * attribution, OHLC resampling, the skyline decomposition, the Markov
  * matrix, MAD outliers, and Benford screening. As with Wave8Spec,
  * the DuckDB hash gate covers value equality; these tests pin the
  * algebra and recompute key slices independently.
  */
class Wave8bSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_minhash_estimate: banded candidates agree on >= 2 signature " +
    "positions, and estimates/exact stay in range") {
    val rows = graft.queries.DedupSim.minhashEstimate
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (agree, est, jac) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // sharing a band means both of that band's positions matched
      assert(agree >= 2 && agree <= 8, s"agree=$agree")
      assert(est == agree * 125)
      assert(jac >= 0 && jac <= 1000000)
    }
  }

  test("q_skyline_pareto equals the naive quadratic skyline") {
    val rows = graft.queries.ScaleOps.skylinePareto
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pts = Tables.load(spark, SharedSpark.sf001, "part")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100, 0).cast("long").as("cents"),
        col("p_size").cast("long").as("size"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = pts.filter { case (_, c, sz) =>
      !pts.exists { case (_, c2, sz2) =>
        c2 <= c && sz2 >= sz && (c2 < c || sz2 > sz)
      }
    }.toSet
    assert(rows == naive, s"engine=${rows.size} naive=${naive.size}")
    assert(rows.nonEmpty)
  }

  test("q_attribution_last_touch matches a per-user replay, and every " +
    "attributed click strictly precedes its purchase") {
    val rows = graft.queries.Windows.attributionLastTouch
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    val events = Tables.load(spark, SharedSpark.sf001, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts").cast("timestamp")).as("ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
      .map { case (u, es) => u -> es.sortBy(e => (e._4, e._2)) }
    rows.foreach { r =>
      val (pid, uid, pms) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val hist = events(uid)
      val idx = hist.indexWhere(_._2 == pid)
      val lastClick = hist.take(idx).reverse.find(_._3 == "click")
      lastClick match {
        case Some((_, cid, _, cms)) =>
          assert(r.getLong(3) == cid && r.getLong(4) == cms)
          assert(cms < pms || (cms == pms && cid < pid))
          assert(r.getLong(5) == pms - cms)
        case None => assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
      }
    }
  }

  test("q_ts_ohlc: high/low bracket open/close, and open/close match " +
    "a time-ordered replay per cell") {
    val rows = graft.queries.Windows.tsOhlc
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    val cells = Tables.load(spark, SharedSpark.sf001, "events")
      .select(col("event_type"),
        unix_millis(col("ts").cast("timestamp")).as("ms"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1) / 3600000L),
        (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1)
      .map { case (k, es) => k -> es.map(_._2).sortBy(e => (e._1, e._2)) }
    rows.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val (n, open, high, low, close) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      val es = cells(k)
      assert(n == es.length)
      assert(open == es.head._3 && close == es.last._3)
      assert(high == es.map(_._3).max && low == es.map(_._3).min)
      assert(low <= open && open <= high && low <= close && close <= high)
    }
  }

  test("q_markov_transitions: rows of the matrix sum to their totals " +
    "and probabilities to ~1e6 (truncation only)") {
    val rows = graft.queries.Analytics.markovTransitions
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val total = rs.head.getLong(3)
      assert(rs.map(_.getLong(2)).sum == total, s"$from counts != total")
      val psum = rs.map(_.getLong(4)).sum
      assert(psum <= 1000000 && psum > 1000000 - rs.length,
        s"$from p_e6 sum $psum outside truncation band")
    }
  }

  test("q_anomaly_mad: gates are null exactly when mad = 0, outliers " +
    "agree with the formula") {
    val rows = graft.queries.Analytics.anomalyMad
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mad = r.getDouble(4)
      if (mad == 0.0) assert(r.isNullAt(5) && r.isNullAt(6))
      else {
        val rz = (r.getLong(2) - r.getDouble(3)) / (1.4826 * mad)
        assert(r.getDouble(5) == rz)
        assert(r.getBoolean(6) == (math.abs(rz) > 3.5))
      }
    }
  }

  test("q_benford_digits: observed counts sum to the order count and " +
    "chi2 components are non-negative") {
    val rows = graft.queries.Analytics.benfordDigits
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.length == 9)
    val nOrders = Tables.load(spark, SharedSpark.sf001, "orders").count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= nOrders)
    }
  }

  test("q_gini_concentration: gini and top-decile share sit in [0, 1e6] " +
    "and the top decile holds at least its uniform share") {
    val rows = graft.queries.Analytics.giniConcentration
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, gini, top10) = (r.getLong(1), r.getLong(3), r.getLong(4))
      assert(gini >= 0 && gini < 1000000, s"gini=$gini")
      assert(top10 >= 0 && top10 <= 1000000)
      // the top ceil(n/10) customers cannot hold LESS than a uniform share
      val topCount = n - n / 10 * 10 match { case _ => n / 10 }
      assert(top10 * n >= topCount * 1000000 - n,
        s"top decile below uniform share: $top10 of n=$n")
    }
  }

  test("q_chisq_independence: margins and totals are consistent") {
    val rows = graft.queries.Analytics.chisqIndependence
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    val n = Tables.load(spark, SharedSpark.sf001, "orders").count()
    assert(rows.map(_.getLong(2)).sum == n)
    rows.foreach(r => assert(r.getLong(4) >= 0))
    // expected_e3 sums back to ~n per segment row (truncation only)
    rows.groupBy(_.getString(0)).foreach { case (seg, rs) =>
      val expSum = rs.map(_.getLong(3)).sum
      val obsRow = rs.map(_.getLong(2)).sum
      assert(math.abs(expSum - obsRow * 1000) <= rs.length * 1000,
        s"$seg expected sum $expSum vs ${obsRow * 1000}")
    }
  }

  test("q_mann_whitney: u2_a + u2_b = 2·n_a·n_b, and u2 matches a " +
    "midrank recompute per nation") {
    val rows = graft.queries.Analytics.mannWhitney
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    val raw = Tables.load(spark, SharedSpark.sf001, "customer")
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100, 0).cast("long"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val (nk, na, nb, u2a, u2b) = (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(u2a + u2b == 2 * na * nb, s"nation $nk identity")
      val pool = raw(nk)
      val ra2 = pool.filter(_._2 == "BUILDING").map { case (_, _, x) =>
        2L * pool.count(_._3 < x) + pool.count(_._3 == x) + 1L
      }.sum
      assert(u2a == ra2 - na * (na + 1), s"nation $nk u2_a recompute")
    }
  }

  test("q_seasonality_how: cells sum to their type totals and the " +
    "mean index is ~1e6 (truncation only)") {
    val rows = graft.queries.Analytics.seasonality
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (t, rs) =>
      val total = rs.map(_.getLong(2)).sum
      // sum over cells of n·168e6 div total ≈ 168e6 less truncation
      val isum = rs.map(_.getLong(3)).sum
      assert(isum <= 168000000L && isum > 168000000L - rs.length * 168,
        s"$t index sum $isum")
      assert(total > 0)
    }
  }

  test("q_hybrid_rrf: fused scores decompose into the documented " +
    "reciprocal terms of the member ranks") {
    val rows = graft.queries.DedupSim.hybridRrf
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rrf = r.getLong(3)
      val sTerm = if (r.isNullAt(4)) 0L else 1000000000L / (60L + r.getAs[Number](4).longValue)
      val dTerm = if (r.isNullAt(5)) 0L else 1000000000L / (60L + r.getAs[Number](5).longValue)
      assert(rrf == sTerm + dTerm, s"rrf $rrf != $sTerm + $dTerm")
      assert(!(r.isNullAt(4) && r.isNullAt(5)))
    }
  }

  test("q_copurchase_lift: confidence and lift decompose into the raw " +
    "basket counts") {
    val rows = graft.queries.Analytics.copurchaseLift
      .run(spark, SharedSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= 1000000 && r.getLong(4) <= 1000000)
      assert(r.getLong(2) >= 3)
      assert(r.getLong(5) > 0)
    }
  }
}
