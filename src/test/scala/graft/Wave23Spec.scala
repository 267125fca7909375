package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 23 invariants: the Cramer OLS against a BigInt sequential
  * recompute, and the EB smoothing against its defining identities.
  */
class Wave23Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_ols_multi equals a sequential BigInt Cramer recompute") {
    val size = Tables.load(spark, SharedSpark.sf001, "part")
      .select("p_partkey", "p_size").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val rows = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_partkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getString(1), size(r.getLong(0)),
        math.round(r.getDouble(2)), math.round(r.getDouble(3) * 100)))
    val want = rows.groupBy(_._1).flatMap { case (flag, g) =>
      val n = BigInt(g.length)
      val s1 = BigInt(g.map(_._2).sum); val s2 = BigInt(g.map(_._3).sum)
      val sy = g.map(e => BigInt(e._4)).sum
      val s11 = g.map(e => BigInt(e._2) * e._2).sum
      val s22 = g.map(e => BigInt(e._3) * e._3).sum
      val s12 = g.map(e => BigInt(e._2) * e._3).sum
      val s1y = g.map(e => BigInt(e._2) * e._4).sum
      val s2y = g.map(e => BigInt(e._3) * e._4).sum
      val syy = g.map(e => BigInt(e._4) * e._4).sum
      def m(ab: BigInt, a: BigInt, b: BigInt) = ab - a * b / n
      val (m11, m22, m12) = (m(s11, s1, s1), m(s22, s2, s2), m(s12, s1, s2))
      val (m1y, m2y, myy) = (m(s1y, s1, sy), m(s2y, s2, sy), m(syy, sy, sy))
      val det = m11 * m22 - m12 * m12
      if (det == 0) None
      else {
        val b1 = (m22 * m1y - m12 * m2y) * 1000000 / det
        val b2 = (m11 * m2y - m12 * m1y) * 1000000 / det
        val b0 = (sy - (b1 * s1 + b2 * s2) / 1000000) / n
        val r2 =
          if (myy > 0) Some(((b1 * m1y + b2 * m2y) / myy).toLong) else None
        Some(flag -> (n.toLong, b1.toLong, b2.toLong, b0.toLong, r2))
      }
    }
    val got = graft.queries.Wave23.olsMulti
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (n, b1, b2, b0, r2) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == b1 && r.getLong(3) == b2,
        s"flag ${r.getString(0)}")
      assert(r.getLong(4) == b0)
      assert(Option(r.get(5)).map(_.asInstanceOf[Long]) == r2)
      // the fit explains a sane share of variance
      r2.foreach(v => assert(v >= 0 && v <= 1000000))
    }
  }

  test("q_ebayes_rates shrinks toward the prior and reproduces its " +
    "defining identities") {
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = ev.groupBy(_._1).map { case (u, g) =>
      (u, g.length.toLong, g.count(_._2 == "purchase").toLong)
    }.toSeq
    val raw = users.map { case (u, n, c) => (u, n, c, c * 1000000L / n) }
    val m = raw.map(_._4).sum / raw.length
    val v = raw.map(r => (r._4 - m) * (r._4 - m)).sum / raw.length
    val kk = if (v > 0) m * (1000000L - m) / v - 1 else 0L
    val got = graft.queries.Wave23.ebayesRates
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == raw.length)
    val rawMap = raw.map(r => r._1 -> r).toMap
    got.foreach { case (u, n, c, rp, prior, sp) =>
      val (_, wn, wc, wr) = rawMap(u)
      assert(n == wn && c == wc && rp == wr, s"user $u")
      assert(prior == m)
      val wantS =
        if (kk > 0) (c * 1000000L + m * kk) / (n + kk) else rp
      assert(sp == wantS, s"user $u smoothed")
      // shrinkage: smoothed sits between raw and the prior mean
      if (kk > 0)
        assert((sp >= math.min(rp, m) - 1) && (sp <= math.max(rp, m) + 1))
    }
  }
}
