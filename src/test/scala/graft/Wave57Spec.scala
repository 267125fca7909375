package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 57 invariants: Palma vs a sequential cut recompute (plus
  * share bounds), Tukey fences vs exact quartile statistics.
  */
class Wave57Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def spend(): Seq[(Long, Long)] =
    Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (ck, g) => (ck, g.map(_._2).sum) }

  test("q_palma_ratio equals a sequential cut recompute") {
    val cu = spend()
    val sorted = cu.sortBy(t => (t._2, t._1)).map(_._2)
    val n = sorted.length.toLong
    val tot = sorted.sum
    val k10 = (n + 9) / 10
    val k40 = 2 * n / 5
    val bot40 = sorted.take(k40.toInt).sum
    val top10 = sorted.drop((n - k10).toInt).sum
    val got = graft.queries.Wave57.palmaRatio
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((n, k10, k40, top10, bot40, top10 * 1000000L / tot,
        bot40 * 1000000L / tot,
        (BigInt(top10) * 1000000 / bot40).toLong)))
    // the top decile of a sorted spend curve holds at least its
    // proportional share; the bottom 40% at most its own
    assert(top10 * 10 >= tot && bot40 * 5 <= tot * 2)
  }

  test("q_tukey_fences equals exact quartile statistics") {
    val segOf = Tables.load(spark, SharedSpark.sf001, "customer")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val cu = spend().map { case (ck, c) => (segOf(ck), ck, c) }
    val want = cu.groupBy(_._1).toSeq.map { case (seg, g) =>
      val sorted = g.sortBy(t => (t._3, t._2)).map(_._3)
      val n = sorted.length.toLong
      val q1 = sorted(((n + 3) / 4 - 1).toInt)
      val q3 = sorted(((3 * n + 3) / 4 - 1).toInt)
      val nLow = sorted.count(x => 2 * x < 5 * q1 - 3 * q3).toLong
      val nHigh = sorted.count(x => 2 * x > 5 * q3 - 3 * q1).toLong
      (seg, n, q1, q3, 5 * q1 - 3 * q3, 5 * q3 - 3 * q1, nLow, nHigh)
    }.sortBy(_._1)
    val got = graft.queries.Wave57.tukeyFences
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.forall(t => t._3 <= t._4)) // q1 <= q3
  }
}
