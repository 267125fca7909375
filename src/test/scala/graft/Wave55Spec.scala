package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 55 invariants: greedy max-coverage vs a sequential replay,
  * plus submodularity's non-increasing marginal gains and the
  * beats-any-single-part lower bound.
  */
class Wave55Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_max_coverage equals a sequential greedy replay") {
    val inc = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val total = inc.map(_._1).distinct.length.toLong
    val byPart = inc.groupBy(_._2).map { case (pk, g) =>
      pk -> g.map(_._1).toSet }
    var unc = inc.map(_._1).toSet
    var covered = 0L
    val want = (1 to 8).map { k =>
      val (pk, gain) = byPart.toSeq
        .map { case (p, os) => (p, (os & unc).size.toLong) }
        .minBy { case (p, g) => (-g, p) }
      covered += gain
      unc = unc -- byPart(pk)
      (k.toLong, pk, gain, covered, covered * 1000000L / total)
    }
    val got = graft.queries.Wave55.maxCoverage
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
    // submodularity: marginal gains never increase round over round
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last))
    // greedy's first pick is the best single part by definition
    assert(got.head._3 == byPart.values.map(_.size).max.toLong)
  }
}
