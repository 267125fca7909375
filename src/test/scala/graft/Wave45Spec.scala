package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 45 invariants: Simpson flip vs sequential moment recompute;
  * median polish vs an independent sweep replay plus the exact
  * reconstruction axiom (cell = resid + row_eff + col_eff) and the
  * zero-column-median postcondition.
  */
class Wave45Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_simpson_flip equals a sequential moment recompute") {
    val partBrand = Tables.load(spark, SharedSpark.sf001, "part")
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_partkey", "CAST(ROUND(l_discount * 100, 0) AS BIGINT)",
        "CAST(l_quantity AS BIGINT)")
      .collect()
      .map(r => (partBrand(r.getLong(0)), r.getLong(1), r.getLong(2)))
    def num(g: Seq[(String, Long, Long)]): Long = {
      val n = g.length.toLong
      val sx = g.map(_._2).sum; val sy = g.map(_._3).sum
      val sxy = g.map(t => t._2 * t._3).sum
      n * sxy - sx * sy
    }
    val pooled = num(li.toSeq)
    val want = li.groupBy(_._1).toSeq.map { case (brand, g) =>
      val sn = num(g.toSeq)
      (brand, g.length.toLong, sn, pooled,
        if (sn * pooled < 0) 1L else 0L)
    }.sortBy(_._1)
    val got = graft.queries.Wave45.simpsonFlip
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("q_median_polish: independent sweep replay + reconstruction axiom") {
    val custNation = Tables.load(spark, SharedSpark.sf001, "customer")
      .selectExpr("c_custkey", "CAST(c_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cells0 = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "CAST(month(o_orderdate) AS BIGINT)",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect()
      .map(r => ((custNation(r.getLong(0)), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    // independent replay: array-indexed sweeps
    def med(vs: Array[Long]): Long = {
      val s = vs.sorted; s((s.length + 1) / 2 - 1)
    }
    var cur = cells0
    val re = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val ce = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to 4) {
      for (nk <- cur.keys.map(_._1).toSeq.distinct) {
        val m = med(cur.collect { case ((r, _), v) if r == nk => v }.toArray)
        re(nk) += m
        cur = cur.map { case (k, v) =>
          k -> (if (k._1 == nk) v - m else v) }
      }
      for (mon <- cur.keys.map(_._2).toSeq.distinct) {
        val m = med(cur.collect { case ((_, c), v) if c == mon => v }.toArray)
        ce(mon) += m
        cur = cur.map { case (k, v) =>
          k -> (if (k._2 == mon) v - m else v) }
      }
    }
    val got = graft.queries.Wave45.medianPolish
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    got.foreach { case (nk, mon, resid, rEff, cEff) =>
      assert(resid == cur((nk, mon)), s"cell ($nk,$mon)")
      assert(rEff == re(nk) && cEff == ce(mon), s"effects ($nk,$mon)")
      // exact reconstruction: original = resid + row effect + col effect
      assert(cells0((nk, mon)) == resid + rEff + cEff, s"recon ($nk,$mon)")
    }
    // last sweep was columns: every column's lower median of residuals is 0
    got.groupBy(_._2).foreach { case (mon, g) =>
      assert(med(g.map(_._3).toArray) == 0L, s"col $mon median")
    }
  }
}
