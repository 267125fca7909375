package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 25 invariants: Boruvka output equals Kruskal's MSF under the
  * same total edge order, and the Shapley values equal a sequential
  * lattice recompute plus the efficiency axiom.
  */
class Wave25Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_graph_mst equals Kruskal under the (w,u,v) total order") {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = li.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val parts = g.map(_._2).sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).collect { case ((u, v), g) if g.size >= 2 =>
      (u, v, 1000000L / g.size)
    }.toSeq.sortBy { case (u, v, w) => (w, u, v) }
    // Kruskal with union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val mst = edges.filter { case (u, v, _) =>
      val (ru, rv) = (find(u), find(v))
      if (ru == rv) false else { parent(ru) = rv; true }
    }.map { case (u, v, w) => (u, v, w) }.toSet
    val got = graft.queries.Wave25.graphMst
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == mst,
      s"boruvka ${got.size} edges vs kruskal ${mst.size}")
    // forest invariant: |V| - |components| edges
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val roots = nodes.map(find).distinct
    assert(mst.size == nodes.size - roots.size)
  }

  test("q_attribution_shapley equals a sequential lattice recompute " +
    "and satisfies efficiency") {
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // iterator first: mapping a Map with a pair-returning lambda
    // yields a Map and silently dedups users by (touchset, converted)
    val users = ev.groupBy(_._1).iterator.map { case (_, g) =>
      val ts = g.map(_._2).toSet
      (Set('v', 'c', 's').filter {
        case 'v' => ts("view"); case 'c' => ts("click")
        case _ => ts("signup")
      }, if (ts("purchase")) 1L else 0L)
    }.toSeq
    val v = users.groupBy(_._1).map { case (s, g) =>
      s -> g.map(_._2).sum * 1000000L / g.length
    }.withDefaultValue(0L)
    def phi(me: Char): Long = {
      val others = Set('v', 'c', 's') - me
      val full = Set('v', 'c', 's')
      2 * (v(Set(me)) - v(Set.empty)) +
        others.toSeq.map(j => v(Set(me, j)) - v(Set(j))).sum +
        2 * (v(full) - v(full - me))
    }
    val touched = Map(
      'v' -> users.count(_._1.contains('v')).toLong,
      'c' -> users.count(_._1.contains('c')).toLong,
      's' -> users.count(_._1.contains('s')).toLong)
    val got = graft.queries.Wave25.attributionShapley
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq("click", "signup", "view"))
    val byCh = Map("view" -> 'v', "click" -> 'c', "signup" -> 's')
    got.foreach { case (ch, p6, nt) =>
      assert(p6 == phi(byCh(ch)), s"channel $ch")
      assert(nt == touched(byCh(ch)))
    }
    // efficiency: sum of phi6 == 6 * (v(N) - v({})) exactly
    assert(got.map(_._2).sum == 6 * (v(Set('v', 'c', 's')) - v(Set.empty)))
  }
}
