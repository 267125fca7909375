package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 30 invariants: duplicate-payment pairs against a naive scan,
  * NW alignment against a sequential DP (plus score bounds).
  */
class Wave30Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_dup_payments equals a naive pair scan") {
    val orders = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .collect()
      .map { r =>
        (r.getLong(0), r.getLong(1),
          math.round(r.getDouble(2) * 100) / 100000L,
          r.getTimestamp(3).getTime / 86400000L)
      }
    val want = (for {
      a <- orders; b <- orders
      if a._2 == b._2 && a._3 == b._3 && a._1 < b._1 &&
        math.abs(a._4 - b._4) <= 365
    } yield (a._2, a._1, b._1, a._3, math.abs(a._4 - b._4))).toSet
    val got = graft.queries.Wave30.dupPayments
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want && got.nonEmpty, s"got ${got.size} want ${want.size}")
  }

  test("q_seq_align equals a sequential NW recompute") {
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .selectExpr("user_id", "event_type", "unix_millis(ts) AS ms",
        "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val top2 = ev.groupBy(_._1).toSeq
      .map { case (u, g) => (u, g.length) }
      .sortBy { case (u, n) => (-n, u) }.take(2).map(_._1)
    // leading positions of a short sequence carry the per-side
    // sentinel, mirroring the engine/oracle COALESCE padding (a bare
    // sa(i-1) would throw IndexOutOfBounds instead of testing the
    // padding semantics — r9 ADVICE)
    def seq(u: Long, tag: Int): Seq[String] = {
      val s = ev.filter(_._1 == u).sortBy(e => (-e._3, -e._4)).take(16)
        .reverse.map(_._2).toSeq
      Seq.fill(16 - s.length)(s"~$tag") ++ s
    }
    val (sa, sb) = (seq(top2(0), 1), seq(top2(1), 2))
    val n = 16
    val dp = Array.ofDim[Long](n + 1, n + 1)
    for (i <- 0 to n) dp(i)(0) = -2L * i
    for (j <- 0 to n) dp(0)(j) = -2L * j
    for (i <- 1 to n; j <- 1 to n)
      dp(i)(j) = math.max(
        dp(i - 1)(j - 1) + (if (sa(i - 1) == sb(j - 1)) 3 else -1),
        math.max(dp(i - 1)(j) - 2, dp(i)(j - 1) - 2))
    val got = graft.queries.Wave30.seqAlign
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == top2(0) && got(0).getLong(1) == top2(1))
    assert(got(0).getLong(2) == dp(n)(n))
    // bounds: score <= 3n, >= -2n-... the all-gap path
    assert(got(0).getLong(2) <= 3L * n && got(0).getLong(2) >= -4L * n)
  }
}
