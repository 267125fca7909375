package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 50 invariants: knapsack vs a sequential greedy replay (plus
  * the budget-feasibility axiom), newsvendor vs exact order
  * statistics (plus the 75%-coverage axiom).
  */
class Wave50Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_knapsack_greedy equals a sequential greedy replay") {
    val sizeOf = Tables.load(spark, SharedSpark.sf001, "part")
      .selectExpr("p_partkey", "CAST(p_size AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val it = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_partkey", "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (pk, g) =>
        val v = g.map(_._2).sum
        (pk, v, sizeOf(pk), v * 1000 / sizeOf(pk))
      }
    val budget = it.map(_._3).sum / 4
    var cw = 0L
    val want = it.sortBy(t => (-t._4, t._1)).zipWithIndex.map {
      case ((pk, v, w, dm), i) =>
        cw += w
        (pk, v, w, dm, i + 1L, cw, budget, if (cw <= budget) 1L else 0L)
    }
    val got = graft.queries.Wave50.knapsackGreedy
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want && got.nonEmpty)
    // feasibility + maximality of the greedy prefix
    val chosenW = want.filter(_._8 == 1L).map(_._3).sum
    val firstOut = want.find(_._8 == 0L)
    assert(chosenW <= budget)
    assert(firstOut.forall(t => chosenW + t._3 > budget))
  }

  test("q_newsvendor_qty equals exact order statistics") {
    val pd = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_partkey",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000",
        "CAST(l_quantity AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((pk, day), g) => (pk, day, g.map(_._3).sum) }
    val want = pd.groupBy(_._1).toSeq.map { case (pk, g) =>
      val sorted = g.sortBy(t => (t._3, t._2)).map(_._3)
      val n = sorted.length.toLong
      (pk, n, sorted(((n + 1) / 2 - 1).toInt),
        sorted(((3 * n + 3) / 4 - 1).toInt))
    }.sortBy(_._1)
    val got = graft.queries.Wave50.newsvendor
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want && got.nonEmpty)
    // the 75% statistic covers at least ceil(3n/4) of observed days
    want.foreach { case (pk, n, _, q75) =>
      val g = pd.filter(_._1 == pk)
      assert(g.count(_._3 <= q75) >= (3 * n + 3) / 4, s"part $pk")
    }
  }
}
