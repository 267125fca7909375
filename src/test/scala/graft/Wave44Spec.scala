package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 44 invariants: Wilson LCB vs a sequential recompute (plus the
  * bound-below-rate axiom), runs test vs a sequential sign-walk.
  */
class Wave44Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_wilson_lcb equals a sequential recompute and lcb <= rate") {
    val partBrand = Tables.load(spark, SharedSpark.sf001, "part")
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_partkey", "l_returnflag").collect()
      .map(r => (partBrand(r.getLong(0)), r.getString(1)))
    val want = li.groupBy(_._1).toSeq.map { case (brand, g) =>
      val n = g.length.toLong
      val s = g.count(_._2 != "R").toLong
      val arg = s * (n - s) * 1000000L / n + 1000000L
      val isq = math.sqrt(arg.toDouble).floor.toLong
      val lcb = ((s + 2) * 1000000L - 2000L * isq) / (n + 4)
      (brand, n, s, s * 1000000L / n, lcb)
    }.sortBy(t => (-t._5, t._1))
    val got = graft.queries.Wave44.wilsonLcb
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.forall(t => t._5 <= t._4)) // LCB never exceeds the rate
  }

  test("q_runs_test equals a sequential sign-walk replay") {
    val daily = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (d, g) => (d, g.map(_._2).sum) }
      .sortBy(_._1)
    val signs = daily.zip(daily.tail).map { case ((_, a), (_, b)) => b - a }
      .filter(_ != 0).map(d => if (d > 0) 1L else -1L)
    val np = signs.count(_ == 1L).toLong
    val nn = signs.count(_ == -1L).toLong
    val runs = 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    val nTot = np + nn
    val mu = 1000000L + 2000000L * np * nn / nTot
    val varE12 = (BigInt(2 * np * nn) * (2 * np * nn - nTot) *
      BigInt("1000000000000") /
      (BigInt(nTot) * nTot * (nTot - 1))).toLong
    val z = (runs * 1000000L - mu) * 1000L /
      math.sqrt(varE12.toDouble).floor.toLong
    val got = graft.queries.Wave44.runsTest
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((np, nn, runs, mu, varE12, z)))
    // run count bounded by the sign count, at least the distinct signs
    assert(runs >= (if (np > 0 && nn > 0) 2L else 1L) && runs <= nTot)
  }
}
