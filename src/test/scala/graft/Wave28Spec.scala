package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 28 invariants: local-max matching against a sequential
  * simulation (plus matching/maximality axioms), and Hare quotas
  * against a sequential recompute (plus the sum-to-100 axiom).
  */
class Wave28Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_bipartite_match equals a sequential local-max simulation " +
    "and is a maximal matching") {
    val base = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_suppkey", "l_partkey", "l_quantity").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), math.round(r.getDouble(2))))
      .groupBy(_._1).map { case (k, g) => (k._1, k._2, g.map(_._2).sum) }
      .toSeq
    var edges = base
    val matched = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var progress = true
    while (progress && edges.nonEmpty) {
      val bs = edges.groupBy(_._1).map { case (s, g) =>
        s -> g.minBy(e => (-e._3, e._2))._2
      }
      val bp = edges.groupBy(_._2).map { case (p, g) =>
        p -> g.minBy(e => (-e._3, e._1))._1
      }
      val m = bs.toSeq.filter { case (s, p) => bp(p) == s }
      progress = m.nonEmpty
      if (progress) {
        matched ++= m
        val ms = m.map(_._1).toSet; val mp = m.map(_._2).toSet
        edges = edges.filterNot(e => ms(e._1) || mp(e._2))
      }
    }
    val affinity = base.map(e => (e._1, e._2) -> e._3).toMap
    val want = matched.map { case (s, p) => (s, p, affinity((s, p))) }.toSet
    val got = graft.queries.Wave28.bipartiteMatch
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"got ${got.size} want ${want.size}")
    // matching axioms: endpoints unique; maximal (no edge with both
    // endpoints free)
    val gs = got.map(_._1); val gp = got.map(_._2)
    assert(gs.size == got.size && gp.size == got.size)
    assert(!base.exists(e => !gs(e._1) && !gp(e._2)))
  }

  test("q_quota_largest_remainder equals a sequential recompute and " +
    "sums to 100") {
    val nation = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val rev = scala.collection.mutable.Map.empty[Long, Long]
    Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_custkey", "o_totalprice").collect()
      .foreach { r =>
        val nk = nation(r.getLong(0))
        rev(nk) = rev.getOrElse(nk, 0L) + math.round(r.getDouble(1) * 100)
      }
    val tot = rev.values.sum
    val fl = rev.toSeq.map { case (nk, rv) =>
      (nk, rv, rv * 100 / tot, rv * 100 % tot)
    }
    val leftover = 100 - fl.map(_._3).sum
    val bumps = fl.sortBy { case (nk, _, _, rem) => (-rem, nk) }
      .take(leftover.toInt).map(_._1).toSet
    val want = fl.map { case (nk, rv, base, _) =>
      nk -> ((rv, base, base + (if (bumps(nk)) 1L else 0L)))
    }.toMap
    val got = graft.queries.Wave28.quotaLargestRemainder
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (nk, v) => assert(v == want(nk), s"nation $nk") }
    assert(got.map(_._2._3).sum == 100L)
  }
}
