package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 61 invariants: TPC-H Q10 against a sequential join recompute;
  * Neyman allocation against a sequential design recompute plus the
  * sum-to-budget and integer-sqrt axioms.
  */
class Wave61Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_tpch_q10_returns equals a sequential join recompute") {
    val nation = Tables.load(spark, SharedSpark.sf001, "nation")
      .selectExpr("n_nationkey", "n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val cust = Tables.load(spark, SharedSpark.sf001, "customer")
      .selectExpr("c_custkey", "c_name", "c_nationkey",
        "CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)").collect()
      .map(r => r.getLong(0) -> (r.getString(1), nation(r.getInt(2)),
        r.getLong(3))).toMap
    val ordQ = Tables.load(spark, SharedSpark.sf001, "orders")
      .filter("o_orderdate >= TIMESTAMP '1997-10-01' AND " +
        "o_orderdate < TIMESTAMP '1998-01-01'")
      .selectExpr("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rev = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .filter("l_returnflag = 'R'")
      .selectExpr("l_orderkey",
        """CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
          | * (10000 - CAST(ROUND(l_discount * 10000, 0) AS BIGINT))"""
          .stripMargin).collect()
      .flatMap(r => ordQ.get(r.getLong(0)).map(ck => (ck, r.getLong(1))))
      .groupBy(_._1).map { case (ck, g) => (ck, g.map(_._2).sum) }
    val want = rev.toSeq.sortBy(t => (-t._2, t._1)).take(20)
      .map { case (ck, rv) =>
        val (nm, nn, ab) = cust(ck)
        (ck, nm, rv, ab, nn)
      }
    val got = graft.queries.Wave61.tpchQ10
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == want && got.length == 20)
    // ranking is by revenue descending
    assert(got.map(_._3) == got.map(_._3).sortBy(-_))
  }

  test("q_sample_stratified equals a sequential Neyman recompute and " +
    "allocations sum to the budget") {
    val seg = Tables.load(spark, SharedSpark.sf001, "customer")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // NB: .toSeq BEFORE the pair map — mapping a Map to (segment, _)
    // pairs would re-key by segment and silently dedup (the CLAUDE.md
    // spec-recompute trap)
    val dollars = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq
      .map { case (ck, g) => (seg(ck), g.map(_._2).sum / 100) }
    val budget = 600L
    val stats = dollars.groupBy(_._1).toSeq.map { case (sg, g) =>
      val xs = g.map(_._2)
      val nh = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum
      val sxx = xs.map(x => BigInt(x) * x).sum
      val vd = ((nh * sxx - sx * sx) / (nh * nh)).toLong
      val sD = math.floor(math.sqrt(vd.toDouble)).toLong
      (sg, nh.toLong, sx.toLong, vd, sD, nh.toLong * sD)
    }.sortBy(_._1)
    val tot = stats.map(_._6).sum
    val fl = stats.map(t => (t, t._6 * budget / tot, t._6 * budget % tot))
    val leftover = budget - fl.map(_._2).sum
    val bump = fl.sortBy(t => (-t._3, t._1._1)).take(leftover.toInt)
      .map(_._1._1).toSet
    val want = fl.map { case (t, base, _) =>
      (t._1, t._2, t._3, t._4, t._5, t._6, base,
        base + (if (bump(t._1)) 1L else 0L))
    }
    val got = graft.queries.Wave61.sampleStratified
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want)
    assert(got.map(_._8).sum == budget)
    // integer sqrt bracket: s^2 <= var < (s+1)^2
    assert(got.forall(t => t._5 * t._5 <= t._4 &&
      t._4 < (t._5 + 1) * (t._5 + 1)))
  }
}
