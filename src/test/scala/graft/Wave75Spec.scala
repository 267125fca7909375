package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 75 invariants: the Brier report recomputed end-to-end in plain
  * Scala (independent MD5 split, train fit, closed forms), and
  * Murphy's decomposition identity BS = REL − RES + UNC verified in
  * EXACT rationals (BigInt numerators over a common denominator) —
  * the truncated e12 outputs must each sit within their divisor of
  * the exact values.
  */
class Wave75Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_eval_brier matches a pure-Scala recompute; Murphy identity " +
    "holds exactly in rationals") {
    def inTrain(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString < "80"
    }
    val docs = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("doc_id", "n_chars", "source").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue / 32,
        if (Set("src0", "src1", "src2")(r.getString(2))) 1L else 0L))
    val byB = docs.groupBy(_._2)
    val f: Map[Long, Long] = byB.map { case (b, xs) =>
      val tr = xs.filter(x => inTrain(x._1))
      b -> (tr.map(_._3).sum + 1) * 1000000L / (tr.length + 2)
    }
    val te = byB.map { case (b, xs) =>
      val t = xs.filterNot(x => inTrain(x._1))
      b -> (t.length.toLong, t.map(_._3).sum)
    }.filter(_._2._1 > 0)
    val nn = te.values.map(_._1).sum
    val oo = te.values.map(_._2).sum
    val out = SparkEntry.queries("q_eval_brier")(spark, SharedSpark.sf001)
      .collect()
    assert(out.map(_.getAs[Long]("b")).toSet == te.keySet)
    // exact rational accumulators (numerators over the denominators
    // n_b and n_b*nn^2; BS is integer exactly)
    var bsExact = BigInt(0)
    var relExact = (BigInt(0), BigInt(1)) // num/den accumulated exactly
    var resExact = (BigInt(0), BigInt(1))
    def addFrac(acc: (BigInt, BigInt), num: BigInt, den: BigInt) =
      (acc._1 * den + num * acc._2, acc._2 * den)
    out.foreach { r =>
      val b = r.getAs[Long]("b")
      val (nTe, oTe) = te(b)
      assert(r.getAs[Long]("n_te") == nTe, s"b=$b")
      assert(r.getAs[Long]("o_te") == oTe, s"b=$b")
      assert(r.getAs[Long]("f_ppm") == f(b), s"b=$b")
      val fp = BigInt(f(b))
      val bs = BigInt(nTe) * fp * fp - 2 * fp * oTe * 1000000L +
        BigInt(oTe) * BigInt(1000000000000L)
      assert(r.getAs[Long]("bs_e12") == bs.toLong, s"b=$b")
      bsExact += bs
      val relNum = (BigInt(nTe) * fp - BigInt(oTe) * 1000000L).pow(2)
      assert(r.getAs[Long]("rel_e12") == (relNum / nTe).toLong, s"b=$b")
      relExact = addFrac(relExact, relNum, BigInt(nTe))
      val resNum = (BigInt(oTe) * nn - BigInt(oo) * nTe).pow(2) *
        BigInt(1000000000000L)
      val resDen = BigInt(nTe) * nn * nn
      assert(r.getAs[Long]("res_e12") == (resNum / resDen).toLong, s"b=$b")
      resExact = addFrac(resExact, resNum, resDen)
      assert(r.getAs[Long]("unc_tot") ==
        (BigInt(oo) * (nn - oo) * BigInt(1000000000000L) / nn).toLong)
    }
    // Murphy (1973): BS = REL - RES + UNC, exact in rationals with
    // UNC = N*obar*(1-obar)*1e12 = oo*(nn-oo)*1e12/nn
    val uncNum = BigInt(oo) * (nn - oo) * BigInt(1000000000000L)
    val lhs = bsExact * relExact._2 * resExact._2 * nn
    val rhs = relExact._1 * resExact._2 * nn -
      resExact._1 * relExact._2 * nn +
      uncNum * relExact._2 * resExact._2
    assert(lhs == rhs, "Murphy decomposition must hold exactly")
  }
}
