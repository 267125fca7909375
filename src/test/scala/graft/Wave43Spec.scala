package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 43 invariants: interval union vs a sequential merge replay,
  * Spearman vs a sequential rank recompute, Kendall vs exhaustive
  * pair classification.
  */
class Wave43Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def cents(p: Double): Long = math.round(p * 100)

  test("q_interval_union_len equals a sequential interval-merge replay") {
    val iv = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_suppkey",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000",
        "CAST(l_quantity AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(1) + r.getLong(2)))
    val want = iv.groupBy(_._1).toSeq.map { case (sk, g) =>
      val sorted = g.map(t => (t._2, t._3)).sortBy(identity)
      // classic merge: fold sorted intervals into disjoint segments
      val segs = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, (s, e)) => List((s, e))
        case ((cs, ce) :: rest, (s, e)) =>
          if (s > ce) (s, e) :: (cs, ce) :: rest
          else (cs, math.max(ce, e)) :: rest
      }
      (sk, g.length.toLong, segs.length.toLong,
        segs.map { case (s, e) => e - s }.sum,
        sorted.map(_._2).max - sorted.map(_._1).min)
    }.sortBy(_._1)
    val got = graft.queries.Wave43.intervalUnion
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("q_spearman_corr equals a sequential rank recompute") {
    val cu = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq
      .map { case (ck, g) => (ck, g.map(_._2).sum, g.length.toLong) }
    val rx = cu.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val ry = cu.sortBy(t => (t._3, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val n = cu.length.toLong
    val sumD2 = cu.map(t => { val d = rx(t._1) - ry(t._1); d * d }).sum
    val rho = 1000000L -
      (BigInt(sumD2) * 6000000 / (BigInt(n) * (n * n - 1))).toLong
    val got = graft.queries.Wave43.spearman
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(2)) ==
      ((n, sumD2, rho)))
    assert(rho <= 1000000L && rho >= -1000000L)
  }

  test("q_kendall_tau equals exhaustive pair classification") {
    val ords = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val custNation = Tables.load(spark, SharedSpark.sf001, "customer")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val na = ords.groupBy(o => custNation(o._1)).toSeq
      .map { case (nk, g) => (nk, g.map(_._2).sum, g.length.toLong) }
      .sortBy(_._1)
    val pairs = for {
      i <- na.indices; j <- na.indices
      if na(i)._1 < na(j)._1
    } yield (na(i), na(j))
    val conc = pairs.count { case (a, b) =>
      (a._2 - b._2) * (a._3 - b._3) > 0 }
    val disc = pairs.count { case (a, b) =>
      (a._2 - b._2) * (a._3 - b._3) < 0 }
    val tied = pairs.count { case (a, b) => a._2 == b._2 || a._3 == b._3 }
    val tau = (conc - disc).toLong * 1000000 / pairs.length
    val got = graft.queries.Wave43.kendall
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      ((na.length.toLong, pairs.length.toLong, conc.toLong, disc.toLong,
        tied.toLong, tau)))
    assert(conc + disc + tied >= pairs.length) // every pair classified
  }
}
