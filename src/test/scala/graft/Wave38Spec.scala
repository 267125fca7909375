package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 38 invariants: Gonzalez coreset vs a sequential greedy replay
  * (plus the radius-monotonicity axiom), KNN-Shapley vs a sequential
  * closed-form replay (plus the efficiency axiom within truncation
  * slack).
  */
class Wave38Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def fx(v: Seq[Float]): Array[Long] =
    v.map(x => math.floor(x.toDouble * 1e6).toLong).toArray

  private def loadEmb(): Array[(Long, Long, Array[Long])] =
    Tables.load(spark, SharedSpark.sf001, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, fx(r.getSeq[Float](2))))

  private def d2(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  test("q_sample_coreset equals a sequential Gonzalez replay; radii " +
    "are non-increasing") {
    val pts = loadEmb().map(p => (p._1, p._3)).sortBy(_._1)
    var centers = Vector(pts.head._2)
    var want = Vector((1L, pts.head._1, 0L))
    for (r <- 2 to 8) {
      val far = pts.map { case (id, v) =>
        (id, centers.map(c => d2(v, c)).min)
      }.maxBy { case (id, dd) => (dd, -id) }
      centers :+= pts.find(_._1 == far._1).get._2
      want :+= ((r.toLong, far._1, far._2))
    }
    val got = graft.queries.Wave38.sampleCoreset
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toVector
    assert(got == want)
    // greedy max-min radii never increase round over round
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a })
    assert(got.map(_._2).distinct.size == 8)
  }

  test("q_knn_shapley equals a sequential closed-form replay; per-probe " +
    "values satisfy the efficiency axiom within truncation slack") {
    val all = loadEmb()
    val probes = all.filter(_._1 % 100 == 7)
    val train = all.filter(_._1 % 100 != 7)
    assert(probes.nonEmpty && train.length > 10)
    // fxdot replays over the ORIGINAL floats (the fx-1e6 longs above
    // are a different, lossier scale), so re-read them raw
    val raw = Tables.load(spark, SharedSpark.sf001, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue,
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val rawMap = raw.map(p => p._1 -> p).toMap
    val K = 5
    val totals = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val nProbes = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((pid, plabel, pv) <- raw if pid % 100 == 7) {
      val ranked = raw.filter(_._1 % 100 != 7).map { case (id, lb, v) =>
        var dot = 0L; var i = 0
        while (i < v.length) {
          dot += math.floor(v(i) * pv(i) * 1e15).toLong; i += 1
        }
        (id, if (lb == plabel) 1L else 0L, dot)
      }.sortBy { case (id, _, dot) => (-dot, id) }
      val n = ranked.length
      val s = new Array[Long](n)
      s(n - 1) = ranked(n - 1)._2 * 1000000000L / n
      for (j <- n - 2 to 0 by -1) {
        val m = j + 1 // 1-based rank
        val num = (ranked(j)._2 - ranked(j + 1)._2) *
          math.min(K.toLong, m) * 1000000000L
        s(j) = s(j + 1) + num / (K * m)
      }
      ranked.zipWithIndex.foreach { case ((id, _, _), j) =>
        totals(id) += s(j); nProbes(id) += 1
      }
      // efficiency: sum_j s_j ~= (#matches among K nearest)/K. Each
      // truncating term t_m errs by < 1 nano and rides into m of the
      // s_j, so the total slack is O(n^2) nano — still < 1e-4 of a
      // full utility unit at these corpus sizes.
      val exact = ranked.take(K).map(_._2).sum * 1000000000L / K
      assert(math.abs(s.sum - exact) <= n.toLong * n + 2L * n,
        s"probe $pid: sum=${s.sum} exact=$exact n=$n")
    }
    val want = totals.toSeq.map { case (id, t) =>
      (id, rawMap(id)._2, t, nProbes(id))
    }.sortBy { case (id, _, t, _) => (-t, id) }.take(20)
    val got = graft.queries.Wave38.knnShapley
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue, r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == want)
  }
}
