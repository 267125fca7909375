package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 35 invariants: clustering coefficients against a sequential
  * recompute; Lorenz cumulative shares against a sorted fold plus
  * curve monotonicity/terminal axioms. */
class Wave35Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_graph_clustering_coeff equals a sequential recompute") {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    // keySet, NOT collect{...=>p}: collect on a Map with a
    // pair-returning function rebuilds a MAP keyed by u and silently
    // keeps one neighbor per node (the Wave26Spec lesson)
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    val adj = scala.collection.mutable
      .Map.empty[Long, scala.collection.mutable.Set[Long]]
    pairs.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set()) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set()) += u
    }
    val want = adj.map { case (u, ns) =>
      val nbrs = ns.toSeq.sorted
      var tri = 0L
      for (i <- nbrs.indices; j <- (i + 1) until nbrs.length)
        if (pairs((nbrs(i), nbrs(j)))) tri += 1
      val deg = nbrs.length.toLong
      val cc = if (deg >= 2) Some(tri * 2000000L / (deg * (deg - 1)))
        else None
      u -> ((deg, tri, cc))
    }
    val got = graft.queries.Wave35.clusteringCoeff
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (deg, tri, cc) = want(r.getLong(0))
      assert(r.getLong(1) == deg && r.getLong(2) == tri,
        s"node ${r.getLong(0)}")
      assert(Option(r.get(3)).map(_.asInstanceOf[Long]) == cc)
    }
  }

  test("q_lorenz_bands equals a sorted fold and the curve is sane") {
    val rev = scala.collection.mutable.Map.empty[Long, Long]
    Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_custkey", "o_totalprice").collect()
      .foreach { r =>
        rev(r.getLong(0)) = rev.getOrElse(r.getLong(0), 0L) +
          math.round(r.getDouble(1) * 100)
      }
    val bands = rev.values.groupBy(_ / 100000L)
      .map { case (b, g) => (b, g.size.toLong, g.sum) }
      .toSeq.sortBy(_._1)
    val nt = bands.map(_._2).sum; val rt = bands.map(_._3).sum
    var (cn, cr) = (0L, 0L)
    val want = bands.map { case (b, n, rv) =>
      cn += n; cr += rv
      b -> ((n, rv, cn * 1000000L / nt,
        (BigInt(cr) * 1000000 / rt).toLong))
    }.toMap
    val got = graft.queries.Wave35.lorenzBands
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (b, v) => assert(v == want(b), s"band $b") }
    // curve: cumulative shares nondecreasing, last row hits ~1e6, and
    // the curve sits below the diagonal (revenue concentrates high)
    val last = got.maxBy(_._1)._2
    assert(last._3 == 1000000L && last._4 == 1000000L)
    got.foreach { case (_, (_, _, cp, rp)) => assert(rp <= cp) }
  }
}
