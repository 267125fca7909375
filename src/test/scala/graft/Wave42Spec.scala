package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 42 invariants: trending top-k vs a sequential leaderboard
  * replay, absorption steps vs a sequential fixed-point replay (plus
  * the one-step Bellman consistency bound).
  */
class Wave42Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_trending_topk equals a sequential leaderboard replay") {
    val pc = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .selectExpr("l_partkey",
        "unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 86400000")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).map { case ((pk, day), g) =>
        (pk, day, g.length.toLong)
      }.toSeq
    val byPart = pc.groupBy(_._1)
    val trail = pc.map { case (pk, day, n) =>
      val t = byPart(pk).filter(r => r._2 >= day - 6 && r._2 <= day)
        .map(_._3).sum
      (pk, day, n, t)
    }
    val ranks = trail.groupBy(_._2).flatMap { case (day, g) =>
      g.sortBy { case (pk, _, _, t) => (-t, pk) }.zipWithIndex
        .map { case ((pk, _, n, t), i) => (pk, day, n, t, i + 1L) }
    }.toSeq
    val byPartRank = ranks.groupBy(_._1)
    val want = ranks.filter(_._5 <= 3).map { case (pk, day, n, t, r) =>
      val prev = byPartRank(pk).filter(_._2 < day)
        .sortBy(-_._2).headOption.map(_._5).getOrElse(-1L)
      (day, r, pk, t, n, prev)
    }.sortBy(x => (x._1, x._2))
    val got = graft.queries.Wave42.trendingTopk
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("q_markov_absorption equals a sequential fixed-point replay and " +
    "is Bellman-consistent") {
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .selectExpr("user_id", "event_type", "unix_millis(CAST(ts AS TIMESTAMP))",
        "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val s = g.sortBy(e => (e._3, e._4)).map(_._2)
      s.zip(s.tail)
    }
    val c = trans.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val tot = trans.groupBy(_._1).map { case (f, g) => f -> g.length.toLong }
    val p = c.toSeq.map { case ((f, t), n) => (f, t, n * 1000000L / tot(f)) }
    val states = p.map(_._1).filter(_ != "purchase").distinct.sorted
    var x = states.map(_ -> 0L).toMap
    for (_ <- 1 to 24) {
      x = states.map { st =>
        val acc = p.filter(r => r._1 == st && r._2 != "purchase" &&
          r._1 != "purchase")
          .map { case (_, to, pe6) => pe6 * x.getOrElse(to, 0L) }.sum
        st -> (1000000L + acc / 1000000L)
      }.toMap
    }
    val pabs = p.filter(r => r._2 == "purchase" && r._1 != "purchase")
      .map(r => r._1 -> r._3).toMap
    val want = states.map(st => (st, x(st), pabs.getOrElse(st, 0L)))
    val got = graft.queries.Wave42.markovAbsorption
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want && got.nonEmpty)
    // converged Bellman residual: one more round moves x by < 1 step
    // (the chain loses >= the direct-conversion mass each round, and
    // 24 rounds is far past the mixing scale at ppm resolution)
    val once = states.map { st =>
      val acc = p.filter(r => r._1 == st && r._2 != "purchase")
        .map { case (_, to, pe6) => pe6 * x.getOrElse(to, 0L) }.sum
      math.abs(x(st) - (1000000L + acc / 1000000L))
    }
    assert(once.forall(_ <= 1000000L), s"residuals=$once")
  }
}
