package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 48 invariants: Kruskal–Wallis and Friedman vs sequential rank
  * replays, plus the rank-sum conservation axioms.
  */
class Wave48Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_kruskal_wallis equals a sequential rank replay") {
    val segOf = Tables.load(spark, SharedSpark.sf001, "customer")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val cu = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (ck, g) => (ck, g.map(_._2).sum) }
    val ranked = cu.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((ck, _), i) => (segOf(ck), i + 1L) }
    val n = ranked.length.toLong
    val groups = ranked.groupBy(_._1).toSeq.map { case (seg, g) =>
      (seg, g.length.toLong, g.map(_._2).sum)
    }.sortBy(_._1)
    val a = groups.map { case (_, nj, rs) =>
      BigInt(rs) * rs * 1000000 / nj }.sum
    val h = (BigInt(12) * a / (BigInt(n) * (n + 1))).toLong -
      3000000L * (n + 1)
    val want = groups.map { case (seg, nj, rs) =>
      (seg, nj, rs, rs * 2000000L / nj - (n + 1) * 1000000L, h)
    }
    val got = graft.queries.Wave48.kruskalWallis
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
    // rank-sum conservation: sum of group rank sums = N(N+1)/2
    assert(groups.map(_._3).sum == n * (n + 1) / 2)
  }

  test("q_friedman_test equals a sequential blocked-rank replay") {
    val custNation = Tables.load(spark, SharedSpark.sf001, "customer")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val nm = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "CAST(month(o_orderdate) AS BIGINT)",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect()
      .map(r => ((custNation(r.getLong(0)), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).toSeq.map { case ((nk, mon), g) =>
        (nk, mon, g.map(_._2).sum) }
    val nMon = nm.map(_._2).distinct.length.toLong
    val fullN = nm.groupBy(_._1).collect {
      case (nk, g) if g.length.toLong == nMon => nk }.toSet
    val ranks = nm.filter(t => fullN(t._1)).groupBy(_._2).toSeq
      .flatMap { case (_, g) =>
        g.sortBy(t => (t._3, t._1)).zipWithIndex
          .map { case ((nk, _, _), i) => (nk, i + 1L) }
      }
    val rj = ranks.groupBy(_._1).toSeq.map { case (nk, g) =>
      (nk, g.map(_._2).sum) }.sortBy(_._1)
    val k = rj.length.toLong
    val sr2 = rj.map(t => BigInt(t._2) * t._2).sum
    val q = (BigInt(12) * sr2 * 1000000 /
      (BigInt(nMon) * k * (k + 1))).toLong - 3000000L * nMon * (k + 1)
    val want = rj.map { case (nk, rt) => (nk, rt, nMon, k, q) }
    val got = graft.queries.Wave48.friedman
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
    // block conservation: every complete block contributes k(k+1)/2
    assert(rj.map(_._2).sum == nMon * k * (k + 1) / 2)
  }
}
