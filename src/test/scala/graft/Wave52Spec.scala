package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 52 invariants: Mann–Kendall vs an exhaustive pair walk,
  * Page–Hinkley vs a sequential detector replay.
  */
class Wave52Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def daily(): Seq[(Long, Long)] =
    Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (d, g) => (d, g.map(_._2).sum) }
      .sortBy(_._1)

  test("q_mann_kendall equals an exhaustive pair walk") {
    val xs = daily().map(_._2)
    val n = xs.length.toLong
    val sStat = (for {
      i <- xs.indices; j <- xs.indices; if j > i
    } yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
    val ties = xs.groupBy(identity).values.map(_.length.toLong)
      .filter(_ > 1).toSeq
    val tieCorr = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
    val varNum = n * (n - 1) * (2 * n + 5) - tieCorr
    val corr = if (sStat > 0) 1L else if (sStat < 0) -1L else 0L
    val z = (sStat - corr) * 6000 /
      math.sqrt((2 * varNum).toDouble).floor.toLong
    val got = graft.queries.Wave52.mannKendall
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((n, sStat, ties.length.toLong, varNum, z)))
    assert(math.abs(sStat) <= n * (n - 1) / 2)
  }

  test("q_page_hinkley equals a sequential detector replay") {
    val ds = daily()
    val lambda = ds.map(_._2).sum / ds.length * 5
    var csum = 0L; var cnt = 0L; var ph = 0L
    var phMin = Long.MaxValue
    val want = ds.map { case (day, x) =>
      csum += x; cnt += 1
      val rmean = csum / cnt
      ph += x - rmean
      phMin = math.min(phMin, ph)
      (day, x, rmean, ph, ph - phMin, if (ph - phMin > lambda) 1L else 0L)
    }
    val got = graft.queries.Wave52.pageHinkley
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.forall(_._5 >= 0L)) // the gap is nonnegative by definition
  }
}
