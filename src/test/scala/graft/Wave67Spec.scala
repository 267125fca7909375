package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent recompute for Wave 67 (q_eval_passk). */
class Wave67Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def passkPpm(n: Long, c: Long, k: Int): Long =
    if (n - c < k) 1000000L
    else {
      val fail = (0 until k).map(i => BigInt(n - c - i)).product
      val all = (0 until k).map(i => BigInt(n - i)).product
      (BigInt(1000000) - fail * 1000000 / all).toLong
    }

  test("q_eval_passk equals a BigInt falling-factorial recompute from " +
    "raw lineitem/part; estimator within 1ppm of the exact binomial " +
    "ratio and nondecreasing in k") {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_partkey", "l_returnflag").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val brand = Tables.load(spark, SharedSpark.sf001, "part")
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tasks = li.groupBy(_._1).toSeq.map { case (pk, xs) =>
      (brand(pk), xs.length.toLong, xs.count(_._2 == "R").toLong)
    }.filter(_._2 >= 5)
    val expect = tasks.groupBy(_._1).map { case (b, ts) =>
      val p1 = ts.map(t => passkPpm(t._2, t._3, 1))
      val p5 = ts.map(t => passkPpm(t._2, t._3, 5))
      b -> (ts.length.toLong, ts.map(_._2).sum, ts.map(_._3).sum,
        p1.sum / ts.length, p5.sum / ts.length)
    }
    val got = SparkEntry.queries("q_eval_passk")(spark, SharedSpark.sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expect, s"pass@k drift: $got vs $expect")
    assert(got.nonEmpty)
    // estimator axioms per task: within 1ppm of the exact C(n-c,k)/C(n,k)
    // rational, and nondecreasing in k (more samples to pass with)
    def binom(n: Long, k: Int): BigInt =
      (0 until k).map(i => BigInt(n - i)).product /
        (1 to k).map(BigInt(_)).product
    tasks.foreach { case (_, n, c) =>
      val p5 = passkPpm(n, c, 5)
      val exact =
        if (n - c < 5) BigInt(1000000)
        else BigInt(1000000) - binom(n - c, 5) * 1000000 / binom(n, 5)
      assert((BigInt(p5) - exact).abs <= 1, s"(n=$n,c=$c): $p5 vs $exact")
      assert(p5 >= passkPpm(n, c, 1), s"pass@5 < pass@1 at (n=$n,c=$c)")
    }
  }
}
