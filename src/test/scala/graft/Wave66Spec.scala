package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent recompute for Wave 66 (q_graph_powerlaw). */
class Wave66Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_graph_powerlaw equals a BigInt recompute from raw lineitem " +
    "(degrees, CCDF, fxlog2 tail fit) and the CCDF telescopes") {
    import graft.plans.FxLog2.fxlog2
    val rows = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = rows.groupBy(_._1)
    // support>=2 co-purchase pairs (iterator first: the pair-map trap)
    val pairs = byOrder.valuesIterator.flatMap { ls =>
      val ps = ls.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keySet
    val deg = pairs.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val hist = deg.values.groupBy(identity)
      .map { case (d, xs) => d -> xs.size.toLong }
    val nTail = hist.collect { case (d, c) if d >= 2 => c }.sum
    val aFx = hist.toSeq.collect { case (d, c) if d >= 2 =>
      c * (fxlog2(d) - (1L << 30)) }.sum
    val alphaMicro =
      if (aFx <= 0) null
      else (BigInt(1000000) +
        BigInt(nTail) * 1442695041L * 1073741824L / (BigInt(aFx) * 1000))
        .toLong
    val got = SparkEntry.queries("q_graph_powerlaw")(
      spark, SharedSpark.sf001).collect()
    assert(got.nonEmpty, "the co-purchase graph must be non-trivial")
    val gotHist = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotHist == hist, s"degree histogram drift: $gotHist vs $hist")
    got.foreach { r =>
      val d = r.getLong(0)
      val expGe = hist.collect { case (dd, c) if dd >= d => c }.sum
      assert(r.getLong(2) == expGe, s"n_ge at deg=$d")
      assert(r.getLong(3) == nTail)
      assert(r.getLong(4) == aFx)
      assert(r.getLong(5) == alphaMicro.asInstanceOf[Long])
    }
    // CCDF telescopes: the smallest degree's n_ge is the node count
    val minDeg = got.map(_.getLong(0)).min
    assert(got.find(_.getLong(0) == minDeg).get.getLong(2)
      == deg.size.toLong)
    // a valid tail exponent reads above 1 (alpha = 1 + positive)
    assert(alphaMicro == null || alphaMicro.asInstanceOf[Long] > 1000000L)
  }
}
