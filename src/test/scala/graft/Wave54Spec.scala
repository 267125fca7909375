package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 54 invariants: SLA percentiles vs exact order statistics
  * (p50<=p90<=p99 monotony), odds ratio vs a sequential 2x2 recompute
  * (direction consistent with or_ppm vs 1e6).
  */
class Wave54Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_sla_shipping equals exact order statistics") {
    val ordMeta = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_orderkey", "o_orderpriority",
        "unix_millis(CAST(o_orderdate AS TIMESTAMP))")
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2))))
      .toMap
    val d = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_orderkey", "CAST(l_linenumber AS BIGINT)",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP))")
      .collect().map { r =>
        val (pri, od) = ordMeta(r.getLong(0))
        (pri, (r.getLong(2) - od) / 86400000L, r.getLong(0), r.getLong(1))
      }
    val want = d.groupBy(_._1).toSeq.map { case (pri, g) =>
      val sorted = g.sortBy(t => (t._2, t._3, t._4)).map(_._2)
      val n = sorted.length.toLong
      def sel(k: Long) = sorted((k - 1).toInt)
      (pri, n, sorted.sum * 1000 / n,
        sel((n + 1) / 2), sel((9 * n + 9) / 10), sel((99 * n + 99) / 100),
        sorted.count(_ > 30L).toLong * 1000000L / n)
    }.sortBy(_._1)
    val got = graft.queries.Wave54.slaShipping
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.forall(t => t._4 <= t._5 && t._5 <= t._6))
  }

  test("q_odds_ratio equals a sequential 2x2 recompute") {
    val partBrand = Tables.load(spark, SharedSpark.sf001, "part")
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_partkey", "l_returnflag").collect()
      .map(r => (partBrand(r.getLong(0)), r.getString(1) == "R"))
    val m = li.groupBy(_._1).toSeq.map { case (b, g) =>
      (b, g.count(_._2).toLong, g.count(!_._2).toLong) }
    val tret = m.map(_._2).sum; val tkept = m.map(_._3).sum
    val want = m.map { case (b, ret, kept) =>
      val oRet = tret - ret; val oKept = tkept - kept
      val orP = (BigInt(ret) * oKept * 1000000 /
        (BigInt(kept) * oRet)).toLong
      val dir = (BigInt(ret) * oKept).compare(BigInt(kept) * oRet).toLong
      (b, ret, kept, oRet, oKept, orP, dir)
    }.sortBy(_._1)
    val got = graft.queries.Wave54.oddsRatio
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want && got.nonEmpty)
    // direction agrees with the ratio's position around 1e6
    assert(got.forall(t => (t._7 > 0) == (t._6 > 1000000L) ||
      t._7 == 0 || t._6 == 1000000L))
  }
}
