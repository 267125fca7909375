package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 26 invariants: Brandes dependencies against a sequential BFS
  * recompute, and DBSCAN roles against a naive all-pairs recompute.
  */
class Wave26Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def edges(): collection.Map[Long, collection.Seq[Long]] = {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    li.groupBy(_._1).valuesIterator.foreach { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) {
        val k = (ps(i), ps(j))
        counts(k) = counts.getOrElse(k, 0) + 1
      }
    }
    val adj = scala.collection.mutable
      .Map.empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
    counts.foreach { case ((u, v), n) =>
      if (n >= 2) {
        adj.getOrElseUpdate(u, scala.collection.mutable.ArrayBuffer()) += v
        adj.getOrElseUpdate(v, scala.collection.mutable.ArrayBuffer()) += u
      }
    }
    adj.withDefaultValue(scala.collection.mutable.ArrayBuffer())
  }

  test("q_graph_betweenness equals a sequential BFS-DAG recompute") {
    val adj = edges()
    val srcs = adj.toSeq
      .map { case (u, vs) => (u, vs.length) }
      .sortBy { case (u, d) => (-d, u) }.take(2).map(_._1)
    val want = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    srcs.foreach { s =>
      // forward: levels with sigma
      val levels = scala.collection.mutable.ArrayBuffer(Map(s -> 1L))
      var visited = Set(s)
      for (_ <- 1 to 3) {
        val next = scala.collection.mutable.Map.empty[Long, Long]
        levels.last.foreach { case (u, sig) =>
          adj(u).foreach { v =>
            if (!visited(v)) next(v) = next.getOrElse(v, 0L) + sig
          }
        }
        levels += next.toMap
        visited ++= next.keySet
      }
      // backward
      var childDelta = Map.empty[Long, Long]
      levels(3).keys.foreach(n => want(n) += 0L)
      for (h <- 2 to 1 by -1) {
        val child = levels(h + 1)
        val delta = scala.collection.mutable.Map.empty[Long, Long]
        levels(h).foreach { case (u, sig) =>
          var t = 0L
          adj(u).foreach { v =>
            if (child.contains(v))
              t += (sig * 1000000L / child(v)) *
                (1000000L + childDelta.getOrElse(v, 0L)) / 1000000L
          }
          delta(u) = t
        }
        delta.foreach { case (u, dl) => want(u) += dl }
        childDelta = delta.toMap
      }
    }
    val got = graft.queries.Wave26.graphBetweenness
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (n, bc) => assert(bc == want(n), s"node $n") }
  }

  test("q_dbscan_core equals a naive all-pairs recompute") {
    val pts = Tables.load(spark, SharedSpark.sf001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        (r.getLong(0),
          math.floor(e(0).toDouble * 1000).toLong,
          math.floor(e(1).toDouble * 1000).toLong)
      }
    val nn = pts.map { case (id, x, y) =>
      id -> pts.filter { case (id2, x2, y2) =>
        id2 != id && (x - x2) * (x - x2) + (y - y2) * (y - y2) <= 10000L
      }.map(_._1)
    }.toMap
    val core = nn.collect { case (id, ns) if ns.length >= 4 => id }.toSet
    val want = pts.map { case (id, _, _) =>
      val role =
        if (core(id)) "core"
        else if (nn(id).exists(core)) "border"
        else "noise"
      id -> ((nn(id).length.toLong, role))
    }.toMap
    val got = graft.queries.Wave26.dbscanCore
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
    assert(got.length == want.size && got.nonEmpty)
    // the classification is non-degenerate at this SF
    assert(got.exists(_._2._2 == "core") && got.exists(_._2._2 != "core"))
    got.foreach { case (id, g) => assert(g == want(id), s"vec $id") }
  }
}
