package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Wave 46 invariants: q_graph_scc vs an exact iterative Tarjan run
  * (labels canonicalized to the min member), q_tie_strength vs a
  * brute-force common-neighbor recompute.
  */
class Wave46Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** Iterative Tarjan SCC; returns v -> min member of v's SCC. */
  private def tarjan(vs: Seq[Long], adj: Map[Long, Seq[Long]])
      : Map[Long, Long] = {
    val idx = mutable.Map.empty[Long, Int]
    val low = mutable.Map.empty[Long, Int]
    val onStk = mutable.Set.empty[Long]
    val stk = mutable.ArrayBuffer.empty[Long]
    val root = mutable.Map.empty[Long, Long]
    var counter = 0
    for (s0 <- vs if !idx.contains(s0)) {
      val work = mutable.ArrayBuffer[(Long, Int)]((s0, 0))
      while (work.nonEmpty) {
        val (v, pi) = work.last
        if (pi == 0) {
          idx(v) = counter; low(v) = counter; counter += 1
          stk += v; onStk += v
        }
        val nbrs = adj.getOrElse(v, Seq.empty)
        var recursed = false
        var i = pi
        while (i < nbrs.length && !recursed) {
          val w = nbrs(i)
          if (!idx.contains(w)) {
            work(work.length - 1) = (v, i + 1)
            work += ((w, 0))
            recursed = true
          } else {
            if (onStk(w)) low(v) = math.min(low(v), idx(w))
            i += 1
          }
        }
        if (!recursed) {
          if (low(v) == idx(v)) {
            var done = false
            while (!done) {
              val w = stk.remove(stk.length - 1)
              onStk -= w
              root(w) = v
              done = w == v
            }
          }
          work.remove(work.length - 1)
          if (work.nonEmpty) {
            val (p, _) = work.last
            low(p) = math.min(low(p), low(v))
          }
        }
      }
    }
    val members = root.toSeq.groupBy(_._2)
    members.values.flatMap { ms =>
      val m = ms.map(_._1).min
      ms.map(t => t._1 -> m)
    }.toMap
  }

  private def directedEdges(): Seq[(Long, Long)] = {
    val inc = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_orderkey", "l_partkey", "CAST(l_linenumber AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).toSeq
      .map { case ((ok, pk), g) => (ok, pk, g.map(_._3).min) }
    inc.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      for {
        a <- g; b <- g
        if a._3 < b._3 || (a._3 == b._3 && a._2 < b._2)
      } yield (a._2, b._2)
    }.distinct
  }

  test("q_graph_scc equals an exact Tarjan decomposition") {
    val es = directedEdges()
    val vs = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val adj = es.groupBy(_._1).map { case (u, g) => u -> g.map(_._2) }
    val lab = tarjan(vs, adj)
    val sizes = lab.values.groupBy(identity).map { case (m, g) =>
      m -> g.size.toLong }
    val want = vs.map(v => (v, lab(v), sizes(lab(v))))
    val got = graft.queries.Wave46.graphScc
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want && got.nonEmpty)
    assert(got.forall(_._2 != -1L), "all vertices settled")
  }

  test("q_tie_strength equals a brute-force neighbor recompute") {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val co: Seq[(Long, Long)] = li.groupBy(_._1).toSeq
      .flatMap { case (_, g) =>
        for { a <- g.toSeq; b <- g.toSeq; if a._2 < b._2 }
          yield (a._2, b._2)
      }
    val pairs = co.groupBy(identity).toSeq
      .collect { case ((u, v), g) if g.size >= 2 => (u, v, g.size.toLong) }
    val nbr = mutable.Map.empty[Long, mutable.Set[Long]]
    pairs.foreach { case (u, v, _) =>
      nbr.getOrElseUpdate(u, mutable.Set.empty) += v
      nbr.getOrElseUpdate(v, mutable.Set.empty) += u
    }
    val want = pairs.map { case (u, v, n) =>
      val du = nbr(u).size.toLong; val dv = nbr(v).size.toLong
      val emb = (nbr(u) & nbr(v)).size.toLong
      val den = du + dv - 2 - emb
      val ov = if (den == 0) 1000000L else emb * 1000000L / den
      (u, v, n, du, dv, emb, ov, if (emb == 0) 1L else 0L)
    }.sortBy(t => (t._1, t._2))
    val got = graft.queries.Wave46.tieStrength
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want && got.nonEmpty)
  }
}
