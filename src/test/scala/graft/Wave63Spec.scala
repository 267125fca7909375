package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 63 invariants: subsequence supports against a sequential scan
  * recompute (with the anti-monotone support axiom) and the
  * Nelson-Aalen curve against a sequential hazard recompute.
  */
class Wave63Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_seq_support equals a sequential recompute and supports are " +
    "anti-monotone in pattern length") {
    val evs = Tables.load(spark, SharedSpark.sf001, "events")
      .selectExpr("user_id", "event_type", "unix_millis(ts)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nUsers = evs.map(_._1).distinct.length.toLong
    val byUser = evs.groupBy(_._1)
    val ft = byUser.map { case (u, g) =>
      u -> g.groupBy(_._2).map { case (t, h) =>
        t -> (h.map(_._3).min, h.map(_._3).max)
      }
    }
    val types = evs.map(_._2).distinct.sorted
    val pairs = for {
      a <- types; b <- types
      sup = ft.valuesIterator.count(m =>
        m.contains(a) && m.contains(b) && m(a)._1 < m(b)._2).toLong
      if sup > 0
    } yield ("pair", a, b, "~", sup)
    val tris = for {
      a <- types; b <- types; c <- types
      sup = byUser.valuesIterator.count { g =>
        val m = ft(g.head._1)
        m.contains(a) && m.contains(c) &&
          g.exists(e => e._2 == b && e._3 > m(a)._1 && e._3 < m(c)._2)
      }.toLong
      if sup > 0
    } yield ("tri", a, b, c, sup)
    val want = (pairs ++ tris)
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._5 * 1000000L / nUsers))
      .sortBy(t => (t._1, t._2, t._3, t._4)).toSeq
    val got = graft.queries.Wave63.seqSupport
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // anti-monotone: sup(a->b->c) <= min(sup(a->b), sup(b->c))
    val pm = got.filter(_._1 == "pair").map(t => (t._2, t._3) -> t._5).toMap
    got.filter(_._1 == "tri").foreach { t =>
      assert(t._5 <= math.min(pm.getOrElse((t._2, t._3), 0L),
        pm.getOrElse((t._3, t._4), 0L)), t.toString)
    }
  }

  test("q_hazard_na equals a sequential hazard recompute and the " +
    "cumulative hazard is nondecreasing") {
    val o = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "unix_millis(o_orderdate) div 86400000")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mx = o.map(_._2).max
    val cl = o.groupBy(_._1).toSeq.map { case (_, g) =>
      val f = g.map(_._2).min
      val l = g.map(_._2).max
      (math.min((l - f) / 91, 7L), (mx - l) > 91)
    }
    val d = (0 to 7).map(k => cl.count(t => t._2 && t._1 == k).toLong)
    val c = (0 to 7).map(k => cl.count(t => !t._2 && t._1 == k).toLong)
    val n = (0 to 7).map(k => (k to 7).map(j => d(j) + c(j)).sum)
    val terms = (0 to 7).map(k =>
      if (n(k) > 0) d(k) * 1000000L / n(k) else 0L)
    val want = (0 to 7).map(k =>
      (k.toLong, n(k), d(k), terms(k), terms.take(k + 1).sum))
    val got = graft.queries.Wave63.hazardNelsonAalen
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    assert(got.map(_._5) == got.map(_._5).sorted) // nondecreasing
    assert(got.forall(t => t._3 <= t._2)) // events never exceed at-risk
  }
}
