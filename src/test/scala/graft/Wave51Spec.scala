package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 51 invariants: Fisher chain vs a sequential basket recompute
  * (plus the L >= F >= P-or-swapped geometric-mean sandwich), HHI vs
  * a sequential share recompute plus the 1/n lower bound.
  */
class Wave51Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_price_index_fisher equals a sequential basket recompute") {
    val pm = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_partkey", "CAST(month(l_shipdate) AS BIGINT)",
        "CAST(l_quantity AS BIGINT)",
        """CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
          | * (10000 - CAST(ROUND(l_discount * 10000, 0) AS BIGINT))"""
          .stripMargin)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (k, g) =>
        val q = g.map(_._2._1).sum
        k -> (q, g.map(_._2._2).sum / q)
      }
    val base = pm.collect { case ((pk, 1L), v) => pk -> v }.toMap
    val want = pm.keys.map(_._2).filter(_ != 1L).toSeq.distinct.sorted
      .map { mon =>
        val j = pm.collect { case ((pk, m), (qm, pmu)) if m == mon &&
          base.contains(pk) => (qm, pmu, base(pk)._1, base(pk)._2) }.toSeq
        val l = j.map(t => BigInt(t._2) * t._3).sum * 1000000 /
          j.map(t => BigInt(t._4) * t._3).sum
        val p = j.map(t => BigInt(t._2) * t._1).sum * 1000000 /
          j.map(t => BigInt(t._4) * t._1).sum
        val f = math.sqrt((l * p).toDouble).floor.toLong
        (mon, j.length.toLong, l.toLong, p.toLong, f)
      }
    val got = graft.queries.Wave51.fisherIndex
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
    // geometric mean sandwich: min(L,P) <= F <= max(L,P)
    assert(got.forall(t => t._5 >= math.min(t._3, t._4) - 1 &&
      t._5 <= math.max(t._3, t._4)))
  }

  test("q_hhi_concentration equals a sequential share recompute") {
    val suppNation = Tables.load(spark, SharedSpark.sf001, "supplier")
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val sr = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_suppkey", "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq
      .map { case (sk, g) => (suppNation(sk), sk, g.map(_._2).sum) }
    val want = sr.groupBy(_._1).toSeq.map { case (nk, g) =>
      val tot = g.map(_._3).sum
      val ss = g.map(t => BigInt(t._3) * t._3).sum
      val hhi = (ss * 1000000 / (BigInt(tot) * tot)).toLong
      (nk, g.length.toLong, tot, hhi,
        if (ss * 4 > BigInt(tot) * tot) 1L else 0L)
    }.sortBy(_._1)
    val got = graft.queries.Wave51.hhi
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
    // HHI lower bound 1/n (equal shares), upper bound 1
    assert(want.forall(t => t._4 >= 1000000 / t._2 - 1 && t._4 <= 1000000))
  }
}
