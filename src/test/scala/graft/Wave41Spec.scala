package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 41 invariants: sliding distinct vs a brute-force per-day
  * window recount (the island algebra proven against the definition),
  * label-noise audit vs a sequential KNN-majority replay.
  */
class Wave41Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_sliding_distinct equals a brute-force trailing-window recount") {
    val ud = Tables.load(spark, SharedSpark.sf001, "events")
      .selectExpr("user_id", "unix_millis(CAST(ts AS TIMESTAMP)) div 86400000")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val days = ud.map(_._2)
    val (mn, mx) = (days.min, days.max)
    // the definition, literally: distinct users active in [d-6, d]
    val want = (mn to mx).map { d =>
      val active = ud.filter { case (_, ad) => ad >= d - 6 && ad <= d }
        .map(_._1).distinct.size.toLong
      val today = ud.filter(_._2 == d).map(_._1).distinct.size.toLong
      (d, active, today)
    }
    val got = graft.queries.Wave41.slidingDistinct
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want && got.nonEmpty)
    // window containment axioms
    got.foreach { case (_, a7, n1) => assert(a7 >= n1) }
  }

  test("q_label_noise equals a sequential KNN-majority replay") {
    val raw = Tables.load(spark, SharedSpark.sf001, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue,
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val refs = raw.filter(_._1 % 20 != 3)
    val cm = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    for ((pid, given, pv) <- raw if pid % 20 == 3) {
      val top = refs.map { case (id, lb, v) =>
        var dot = 0L; var i = 0
        while (i < v.length) {
          dot += math.floor(v(i) * pv(i) * 1e15).toLong; i += 1
        }
        (id, lb, dot)
      }.sortBy { case (id, _, dot) => (-dot, id) }.take(5)
      val knn = top.groupBy(_._2).toSeq
        .map { case (lb, g) => (lb, g.length) }
        .sortBy { case (lb, v) => (-v, lb) }.head._1
      cm((given, knn)) += 1
    }
    val want = cm.toSeq.map { case ((g, k), n) =>
      val tot = cm.collect { case ((gg, _), nn) if gg == g => nn }.sum
      val od = cm.collect { case ((gg, kk), nn) if gg == g && gg != kk => nn }.sum
      (g, k, n, od * 1000000L / tot)
    }.sortBy(t => (t._1, t._2))
    val got = graft.queries.Wave41.labelNoise
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == want && got.nonEmpty)
  }
}
