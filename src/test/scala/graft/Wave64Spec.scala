package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.FxLog2

/** Wave 64 invariants: PSI against a sequential decile/term recompute
  * and WoE/IV against a sequential scorecard recompute, plus the
  * band/threshold axioms.
  */
class Wave64Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def cents(year: Int): Seq[(Long, Long)] =
    Tables.load(spark, SharedSpark.sf001, "orders")
      .filter(s"EXTRACT(YEAR FROM o_orderdate) = $year")
      .selectExpr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)",
        "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("q_drift_psi equals a sequential decile recompute") {
    val bp = cents(1997)
    val cq = cents(1998).map(_._1)
    val sorted = bp.sortBy(identity).map(_._1)
    val n = sorted.length.toLong
    val nq = cq.length.toLong
    val edges = (1 to 9).map(i => sorted(((i * n) / 10 - 1).toInt))
    def bin(c: Long): Int = edges.indexWhere(c <= _) match {
      case -1 => 9; case i => i
    }
    val cp = (0 to 9).map(b => bp.count(t => bin(t._1) == b).toLong)
    val cnq = (0 to 9).map(b => cq.count(bin(_) == b).toLong)
    val want = (0 to 9).map { b =>
      val ap = (cp(b) + 1) * (nq + 10)
      val aq = (cnq(b) + 1) * (n + 10)
      val pp = cp(b) * 1000000L / n
      val pq = cnq(b) * 1000000L / nq
      (b.toLong, cp(b), cnq(b), pp, pq,
        (pp - pq) * (FxLog2.fxlog2(ap) - FxLog2.fxlog2(aq)))
    }
    val psi = (want.map(t => BigInt(t._6)).sum / 1073741824L).toLong
    val band = if (psi < 144270) 0L else if (psi < 360674) 1L else 2L
    val got = graft.queries.Wave64.driftPsi
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want.map(t => (t._1, t._2, t._3, t._4, t._5, t._6, psi,
      band)))
    // baseline deciles: baseline bin counts are within 1 of n/10 each
    assert(cp.forall(c => (c - n / 10).abs <= (n / 10 + 9)))
    assert(got.map(_._2).sum == n && got.map(_._3).sum == nq)
  }

  test("q_feature_woe_iv equals a sequential scorecard recompute") {
    val o = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_orderkey", "o_custkey", "o_orderpriority",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val seg = Tables.load(spark, SharedSpark.sf001, "customer")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sorted = o.map(t => (t._4, t._1)).sortBy(identity)
    val med = sorted(((sorted.length + 1) / 2 - 1).toInt)._1
    val rows = o.map(t => (seg(t._2), t._3, if (t._4 > med) 1L else 0L))
    def scorecard(feat: String, key: ((String, String, Long)) => String) = {
      val byBin = rows.groupBy(key).toSeq
      val g = rows.count(_._3 == 1L).toLong
      val b = rows.count(_._3 == 0L).toLong
      val te = byBin.map { case (bin, xs) =>
        val good = xs.count(_._3 == 1L).toLong
        val bad = xs.count(_._3 == 0L).toLong
        val woe = FxLog2.fxlog2((good + 1) * (b + 5)) -
          FxLog2.fxlog2((bad + 1) * (g + 5))
        (feat, bin, good, bad, woe,
          (good * 1000000L / g - bad * 1000000L / b) * woe)
      }
      val iv = (te.map(t => BigInt(t._6)).sum / 1073741824L).toLong
      val strength = if (iv < 28854) 0L else if (iv < 144270) 1L
        else if (iv < 432808) 2L else 3L
      te.map(t => (t._1, t._2, t._3, t._4, t._5, t._6, iv, strength))
    }
    val want = (scorecard("mktsegment", _._1) ++
      scorecard("orderpriority", _._2)).sortBy(t => (t._1, t._2))
    val got = graft.queries.Wave64.featureWoeIv
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want)
    // each feature's bins partition the corpus
    got.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(t => t._3 + t._4).sum == o.length.toLong)
    }
  }
}
