package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 53 invariants: capture–recapture vs a sequential recompute
  * (plus the Chapman <= LP bound when m>0), segment migration vs a
  * sequential tercile replay with conservation axioms.
  */
class Wave53Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def orders(): Seq[(Long, Long, Long)] =
    Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "unix_millis(CAST(o_orderdate AS TIMESTAMP))",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("q_capture_recapture equals a sequential recompute") {
    val os = orders()
    val lo = os.map(_._2).min; val hi = os.map(_._2).max
    val byCk = os.groupBy(_._1).toSeq
    val s1 = byCk.count { case (_, g) => g.exists(_._2 * 3 < lo * 2 + hi) }
      .toLong
    val s2 = byCk.count { case (_, g) => g.exists(_._2 * 3 >= lo + hi * 2) }
      .toLong
    val m = byCk.count { case (_, g) =>
      g.exists(_._2 * 3 < lo * 2 + hi) && g.exists(_._2 * 3 >= lo + hi * 2)
    }.toLong
    val nTrue = byCk.length.toLong
    val lp = if (m == 0) -1L else s1 * s2 / m
    val ch = (s1 + 1) * (s2 + 1) / (m + 1) - 1
    val got = graft.queries.Wave53.captureRecapture
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == ((s1, s2, m, nTrue, lp, ch)))
    if (m > 0) assert(ch <= lp + 1) // Chapman corrects LP's upward bias
  }

  test("q_segment_migration equals a sequential tercile replay") {
    val os = orders()
    val lo = os.map(_._2).min; val hi = os.map(_._2).max
    val cu = os.groupBy(_._1).toSeq.map { case (ck, g) =>
      (ck, g.filter(_._2 * 2 < lo + hi).map(_._3).sum,
        g.filter(_._2 * 2 >= lo + hi).map(_._3).sum)
    }
    val n = cu.length.toLong
    def segs(by: ((Long, Long, Long)) => Long): Map[Long, Long] = {
      val na = cu.count(t => by(t) > 0).toLong
      cu.sortBy(t => (by(t), t._1)).zipWithIndex.map { case (t, i) =>
        val a = (i + 1L) - (n - na)
        t._1 -> (if (by(t) == 0) 0L
                 else if (3 * a > 2 * na) 3L
                 else if (3 * a > na) 2L else 1L)
      }.toMap
    }
    val s1 = segs(_._2); val s2 = segs(_._3)
    val want = cu.map(t => (s1(t._1), s2(t._1)))
      .groupBy(identity).toSeq.map { case ((a, b), g) =>
        (a, b, g.size.toLong) }
    val rowN = want.groupBy(_._1).map { case (k, g) => k -> g.map(_._3).sum }
    val wantFull = want.map { case (a, b, c) =>
      (a, b, c, c * 1000000L / rowN(a)) }.sortBy(t => (t._1, t._2))
    val got = graft.queries.Wave53.segmentMigration
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == wantFull && got.nonEmpty)
    // conservation: matrix cells sum to the customer count
    assert(got.map(_._3).sum == n)
  }
}
