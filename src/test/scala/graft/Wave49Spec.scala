package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 49 invariants: KS vs a sequential merged-CDF walk; XYZ vs a
  * literal 12-month deviation recompute (proving the closed form).
  */
class Wave49Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_ks_test equals a sequential merged-CDF walk") {
    val segOf = Tables.load(spark, SharedSpark.sf001, "customer")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val cu = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (ck, g) => (ck, g.map(_._2).sum) }
      .map { case (ck, cents) => (ck, cents, segOf(ck)) }
      .filter(t => t._3 == "AUTOMOBILE" || t._3 == "BUILDING")
    val na = cu.count(_._3 == "AUTOMOBILE").toLong
    val nb = cu.count(_._3 == "BUILDING").toLong
    var ca = 0L; var cb = 0L
    val walk = cu.sortBy(t => (t._2, t._1)).zipWithIndex.map {
      case ((_, cents, seg), i) =>
        if (seg == "AUTOMOBILE") ca += 1 else cb += 1
        (i + 1L, cents, math.abs(ca * nb - cb * na))
    }
    val dNum = walk.map(_._3).max
    val first = walk.filter(_._3 == dNum).minBy(_._1)
    val got = graft.queries.Wave49.ksTest
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      ((na, nb, dNum, dNum * 1000000L / (na * nb), first._1, first._2)))
    assert(dNum <= na * nb) // D in [0, 1]
  }

  test("q_xyz_class equals a literal 12-month deviation recompute") {
    val pm = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_partkey", "CAST(month(l_shipdate) AS BIGINT)",
        "CAST(l_quantity AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((pk, mon), g) => (pk, mon, g.map(_._3).sum) }
    val want = pm.groupBy(_._1).toSeq.map { case (pk, g) =>
      val tot = g.map(_._3).sum
      val m3 = tot * 1000 / 12
      // literal deviation over all 12 calendar months, absents = 0
      val byMon = g.map(t => t._2 -> t._3).toMap
      val dev2 = (1L to 12L).map { mon =>
        val d = byMon.getOrElse(mon, 0L) * 1000 - m3; d * d
      }.sum
      val sd3 = math.sqrt((dev2 / 12).toDouble).floor.toLong
      val cv = if (m3 == 0) -1L else sd3 * 1000000L / m3
      val cls = if (m3 == 0) "Z"
        else if (cv < 500000) "X" else if (cv < 1000000) "Y" else "Z"
      (pk, tot, g.length.toLong, m3, sd3, cv, cls)
    }.sortBy(_._1)
    val got = graft.queries.Wave49.xyzClass
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6))).toSeq
    assert(got == want && got.nonEmpty)
  }
}
