package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave 19 invariants: multi-source closeness against a sequential
  * BFS reference, and the boosting loop against an in-memory BigInt
  * replay with the SSE-decreases witness.
  */
class Wave19Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_graph_closeness equals sequential per-seed BFS") {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { rs =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).toSeq.collect {
      case (p, g) if g.size >= 2 => p
    }
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._2) }
    val deg = adj.map { case (u, es) => u -> es.size.toLong }
    val seeds = deg.toSeq.sortBy { case (u, dg) => (-dg, u) }.take(4)
      .map(_._1)
    val want = seeds.flatMap { s0 =>
      var dist = Map(s0 -> 0L)
      (1 to 3).foreach { _ =>
        val relaxed = dist.toSeq.flatMap { case (u, du) =>
          adj.getOrElse(u, Nil).map(v => (v, du + 1))
        }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (n, ds) => n -> ds.map(_._2).min }
      }
      val reached = dist.size.toLong
      val sd = dist.values.sum
      val cl = if (sd > 0) Some((reached - 1) * 1000000L / sd) else None
      dist.toSeq.map { case (n, dd) => (s0, n, dd, reached, cl) }
    }.sortBy(t => (t._1, t._2))
    val got = graft.queries.Wave19.graphCloseness
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == want)
  }

  test("q_tree_boost equals an in-memory replay and SSE decreases") {
    val li = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_quantity", "l_discount", "l_extendedprice").collect()
      .map(r => (r.getDouble(0).toLong, math.round(r.getDouble(1) * 100),
        math.round(r.getDouble(2) * 100)))
    val p0 = li.map(_._3).sum / li.length
    var rs = li.map(t => (t._1, t._2, t._3 - p0))
    val wantRows = (1 to 2).map { rnd =>
      val feats = Seq("dc" -> rs.map(t => (t._2, t._3)),
        "qty" -> rs.map(t => (t._1, t._3)))
      val cands = feats.flatMap { case (f, vy) =>
        val mn = vy.map(_._1).min; val mx = vy.map(_._1).max
        val binned = vy.map { case (v, r) =>
          ((v - mn) * 32 / (mx - mn + 1), r)
        }
        val nt = binned.length.toLong
        val st = binned.map(t => BigInt(t._2)).sum
        binned.map(_._1).distinct.sorted.flatMap { b =>
          val left = binned.filter(_._1 <= b)
          val nl = left.length.toLong
          val sl = left.map(t => BigInt(t._2)).sum
          val (nr, sr) = (nt - nl, st - sl)
          if (nr == 0) None
          else Some((f, b, nl, nr, (sl / nl).toLong, (sr / nr).toLong,
            (sl * sl / nl / 1000000000 + sr * sr / nr / 1000000000).toLong))
        }
      }
      val best = cands.sortBy { case (f, b, _, _, _, _, s) => (-s, f, b) }.head
      val sse = (rs.map(t => BigInt(t._3) * t._3).sum / 1000000).toLong
      // apply the stump to form next-round residuals
      val (bf, bb, _, _, ll, lr, _) = best
      val vy = if (bf == "qty") rs.map(_._1) else rs.map(_._2)
      val mn = vy.min; val mx = vy.max
      rs = rs.map { case (q, dc, r) =>
        val v = if (bf == "qty") q else dc
        val leaf = if ((v - mn) * 32 / (mx - mn + 1) <= bb) ll else lr
        (q, dc, r - leaf)
      }
      (rnd.toLong, best._1, best._2, best._3, best._4, best._5, best._6,
        best._7, sse)
    }
    val got = graft.queries.Wave19.treeBoost
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).toSeq
    assert(got == wantRows)
    // boosting must reduce SSE: round 2's input SSE (post-stump-1)
    // below round 1's, and the round-2 stump must still find signal
    assert(got(1)._9 < got(0)._9, s"SSE did not decrease: $got")
    assert(got.forall(_._8 > 0))
  }
}
