package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 56 invariants: EMD vs a sequential band walk (plus the
  * EMD >= 0 and KS-consistency bound), CVaR vs exact tail statistics
  * (CVaR <= VaR by construction on the lower tail).
  */
class Wave56Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_emd_histogram equals a sequential band walk") {
    val segOf = Tables.load(spark, SharedSpark.sf001, "customer")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val cu = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (ck, g) => (segOf(ck), g.map(_._2).sum) }
      .filter(t => t._1 == "AUTOMOBILE" || t._1 == "BUILDING")
    val na = cu.count(_._1 == "AUTOMOBILE").toLong
    val nb = cu.count(_._1 == "BUILDING").toLong
    val bands = cu.map(t => (t._2 / 100000L, t._1)).groupBy(_._1).toSeq
      .map { case (b, g) => (b, g.count(_._2 == "AUTOMOBILE").toLong,
        g.count(_._2 == "BUILDING").toLong) }.sortBy(_._1)
    var ca = 0L; var cb = 0L
    val emd = bands.map { case (_, a, b) =>
      ca += a; cb += b; math.abs(ca * nb - cb * na)
    }.sum
    val got = graft.queries.Wave56.emdHistogram
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) ==
      ((na, nb, bands.length.toLong, emd, emd * 1000000L / (na * nb))))
    assert(emd >= 0L)
  }

  test("q_cvar_daily equals exact tail statistics") {
    val daily = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (d, g) => (d, g.map(_._2).sum) }
    val n = daily.length.toLong
    val k = (n + 19) / 20
    val sorted = daily.sortBy(t => (t._2, t._1)).map(_._2)
    val tail = sorted.take(k.toInt)
    val varC = sorted((k - 1).toInt)
    val cvar = tail.sum / k
    val share = tail.sum * 1000000L / daily.map(_._2).sum
    val got = graft.queries.Wave56.cvarDaily
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((n, k, varC, cvar, share)))
    assert(cvar <= varC) // lower-tail mean never exceeds the quantile
  }
}
