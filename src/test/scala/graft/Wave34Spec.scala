package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 34 invariants: water-filling against a sequential recompute
  * plus the allocation axioms. */
class Wave34Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_fairshare_maxmin equals sequential water-filling and " +
    "satisfies the axioms") {
    val nation = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val dem = scala.collection.mutable.Map.empty[Long, Long]
    Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_custkey").collect()
      .foreach { r =>
        val nk = nation(r.getLong(0))
        dem(nk) = dem.getOrElse(nk, 0L) + 1
      }
    val td = dem.values.sum
    val cap = td / 2
    val sorted = dem.toSeq.sortBy { case (nk, d) => (d, nk) }
    val n = sorted.length.toLong
    // sequential water-filling
    var pre = 0L
    val sat = sorted.zipWithIndex.map { case ((nk, d), i) =>
      val ok = d * (n - i) <= cap - pre
      pre += d
      (nk, d, ok)
    }
    val kk = sat.count(_._3).toLong
    val pk = sat.filter(_._3).map(_._2).sum
    val level = (cap - pk) / (n - kk)
    val residue = (cap - pk) % (n - kk)
    val want = sat.zipWithIndex.map { case ((nk, d, ok), i) =>
      val alloc =
        if (ok) d
        else level + (if (i + 1 - kk <= residue) 1L else 0L)
      nk -> ((d, alloc, if (ok) 1L else 0L))
    }.toMap
    val got = graft.queries.Wave34.fairshareMaxmin
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (nk, d, a, s) =>
      assert((d, a, s) == want(nk), s"nation $nk")
      assert(a <= d)
    }
    assert(got.map(_._3).sum == cap)
    assert(got.exists(_._4 == 0L))
  }
}
