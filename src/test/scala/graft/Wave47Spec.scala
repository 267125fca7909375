package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 47 invariants: Bollinger bands vs a sequential trailing-window
  * replay (plus the sd-nonnegativity and band-sandwich axioms), EOQ vs
  * a sequential recompute.
  */
class Wave47Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_bollinger_bands equals a sequential trailing-window replay") {
    val daily = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (d, g) => (d, g.map(_._2).sum) }
      .sortBy(_._1)
    val want = daily.map { case (day, cents) =>
      val w = daily.filter(t => t._1 >= day - 6 && t._1 <= day)
      val n = w.length.toLong
      val s = w.map(_._2).sum
      val ss = w.map(t => BigInt(t._2) * t._2).sum
      val m = s / n
      val varr = ((ss - 2 * BigInt(m) * s + BigInt(n) * m * m) / n).toLong
      val sd = math.sqrt(varr.toDouble).floor.toLong
      val br = if (cents > m + sd) 1L else if (cents < m - sd) -1L else 0L
      (day, cents, n, m, sd, m + sd, m - sd, br)
    }
    val got = graft.queries.Wave47.bollinger
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.forall(t => t._5 >= 0L && t._7 <= t._6))
  }

  test("q_eoq_policy equals a sequential recompute") {
    val price = Tables.load(spark, SharedSpark.sf001, "part")
      .selectExpr("p_partkey", "CAST(ROUND(p_retailprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val dem = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_partkey", "CAST(l_quantity AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (pk, g) => (pk, g.map(_._2).sum) }
    val want = dem.map { case (pk, d) =>
      val h = price(pk)
      val eoq = math.sqrt((2 * d * 10000L / h).toDouble).floor.toLong
      val nOrders = if (eoq == 0) d else d / eoq
      val cyc = if (d == 0) 0L else 365 * math.max(eoq, 1L) / d
      (pk, d, h, eoq, nOrders, cyc)
    }.sortBy(_._1)
    val got = graft.queries.Wave47.eoq
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want && got.nonEmpty)
    // EOQ optimality neighborhood: cost(eoq) <= cost(eoq+1) under the
    // integer model's continuous relaxation bracketing
    assert(want.forall { case (_, d, h, eoq, _, _) =>
      eoq * eoq <= 2 * d * 10000L / h &&
        (eoq + 1) * (eoq + 1) > 2 * d * 10000L / h
    })
  }
}
