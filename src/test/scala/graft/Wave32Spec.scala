package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 32 invariants: LTV curves against a sequential recompute,
  * plus curve monotonicity. */
class Wave32Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_cohort_ltv equals a sequential recompute and is monotone") {
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .selectExpr("user_id", "unix_millis(ts) AS ms", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) / 604800000L, r.getString(2),
        math.round(r.getDouble(3) * 100)))
    val cohort = ev.groupBy(_._1).map { case (u, g) =>
      u -> g.map(_._2).min
    }
    val cohortN = cohort.values.groupBy(identity)
      .map { case (c, g) => c -> g.size.toLong }
    val rev = ev.filter(_._3 == "purchase")
      .groupBy(e => (cohort(e._1), e._2 - cohort(e._1)))
      .map { case (k, g) => k -> g.map(_._4).sum }
    val want = rev.groupBy(_._1._1).flatMap { case (cw, g) =>
      var cum = 0L
      g.toSeq.sortBy(_._1._2).map { case ((_, off), rc) =>
        cum += rc
        (cw, off) -> ((rc, cum, cohortN(cw), cum / cohortN(cw)))
      }
    }
    val got = graft.queries.Wave32.cohortLtv
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (k, v) => assert(v == want(k), s"cell $k") }
    // cumulative curves are nondecreasing within each cohort
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      rows.sortBy(_._1._2).map(_._2._2).sliding(2).foreach {
        case Array(a, b) => assert(a <= b)
        case _ =>
      }
    }
  }
}
