package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 36 invariant: Fano factors against a sequential recompute. */
class Wave36Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_traffic_burstiness equals a sequential recompute") {
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .selectExpr("event_type", "unix_millis(ts) AS ms").collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000L))
    val want = ev.groupBy(_._1).map { case (t, g) =>
      val counts = g.groupBy(_._2).map(_._2.length.toLong).toSeq
      val n = counts.length.toLong
      val total = counts.sum
      val s2 = counts.map(c => c * c).sum
      val m2 = BigInt(s2) - BigInt(total) * total / n
      t -> ((n, total, counts.max, (m2 * 1000000 / total).toLong))
    }
    val got = graft.queries.Wave36.trafficBurstiness
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (t, v) => assert(v == want(t), s"type $t") }
  }
}
