package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 78 invariants: the token-budget plan recomputed end-to-end in
  * plain Scala, plus the plan's conservation/boundedness properties.
  */
class Wave78Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_token_budget matches a pure-Scala recompute and its plan " +
    "invariants hold") {
    val bySrc = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split(" ").count(_.nonEmpty).toLong))
      .groupBy(_._1).map { case (src, xs) => src -> xs.map(_._2).sum }
    val tAvail = bySrc.values.sum
    val wt = bySrc.map { case (s, a) => s -> math.sqrt(a.toDouble).toLong }
    val tWt = wt.values.sum
    val budget = BigInt(2) * tAvail
    val out = SparkEntry.queries("q_token_budget")(spark, SharedSpark.sf001)
      .collect()
    assert(out.map(_.getString(0)).toSet == bySrc.keySet)
    var allocSum = BigInt(0)
    out.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Long]("avail") == bySrc(src), src)
      assert(r.getAs[Long]("wt") == wt(src), src)
      val alloc = budget * wt(src) / tWt
      assert(BigInt(r.getAs[Long]("alloc")) == alloc, src)
      val epochs = alloc * 1000000 / bySrc(src)
      assert(BigInt(r.getAs[Long]("epochs_ppm")) == epochs, src)
      assert(r.getAs[Long]("over4") == (if (epochs > 4000000) 1L else 0L), src)
      allocSum += alloc
    }
    // conservation: truncation loses at most (n_sources - 1) tokens
    assert(allocSum <= budget)
    assert(budget - allocSum < out.length)
    // sqrt temperature flattens (theorem for the extremes: for the
    // min-avail source Σ_j √a_j(√a_j − √a_min) >= 0 so its sqrt share
    // >= its proportional share; dually for the max): the smallest
    // source is never down-weighted, the largest never up-weighted
    val minSrc = bySrc.minBy(x => (x._2, x._1))._1
    val maxSrc = bySrc.maxBy(x => (x._2, x._1))._1
    def share(src: String): BigDecimal = BigDecimal(
      out.find(_.getString(0) == src).get.getAs[Long]("alloc")) /
      BigDecimal(budget)
    def propShare(src: String): BigDecimal =
      BigDecimal(bySrc(src)) / BigDecimal(tAvail)
    assert(share(minSrc) >= propShare(minSrc) - BigDecimal("0.000001"))
    assert(share(maxSrc) <= propShare(maxSrc) + BigDecimal("0.000001"))
  }
}
