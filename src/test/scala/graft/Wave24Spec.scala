package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 24 invariants: DTW against a sequential DP, MMR against a
  * sequential greedy recompute of the full select path.
  */
class Wave24Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def dtw(a: Array[Long], b: Array[Long]): Long = {
    val n = a.length
    val dp = Array.ofDim[Long](n, n)
    for (i <- 0 until n; j <- 0 until n) {
      val cost = math.abs(a(i) - b(j))
      dp(i)(j) = cost + {
        if (i == 0 && j == 0) 0L
        else if (i == 0) dp(0)(j - 1)
        else if (j == 0) dp(i - 1)(0)
        else math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
      }
    }
    dp(n - 1)(n - 1)
  }

  test("q_ts_dtw equals a sequential DP over recomputed curves") {
    val nations = Tables.load(spark, SharedSpark.sf001, "nation")
      .select("n_nationkey").collect().map(_.getAs[Number](0).longValue)
    val custNation = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val vecs = scala.collection.mutable.Map(
      nations.map(n => n -> Array.fill(12)(0L)): _*)
    Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .foreach { r =>
        val dt = r.getTimestamp(1).toLocalDateTime
        if (dt.getYear == 1998) {
          val nk = custNation(r.getLong(0))
          vecs(nk)(dt.getMonthValue - 1) +=
            math.round(r.getDouble(2) * 100) / 100
        }
      }
    val want = (for {
      a <- nations; b <- nations if a < b
    } yield (a, b) -> dtw(vecs(a), vecs(b))).toMap
    val got = graft.queries.Wave24.tsDtw
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (k, v) => assert(v == want(k), s"pair $k") }
  }

  private def fxDot(a: Array[Float], b: Array[Float]): Long = {
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += math.floor(a(i).toDouble * b(i).toDouble * 1e15).toLong
      i += 1
    }
    acc
  }

  test("q_retrieval_mmr equals a sequential greedy recompute") {
    val emb = Tables.load(spark, SharedSpark.sf001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val byId = emb.toMap
    val probes = emb.map(_._1).filter(_ % 100 == 0).sorted
    val nrm = emb.map { case (id, v) =>
      id -> math.sqrt(fxDot(v, v).toDouble / 1e15)
    }.toMap
    val want = probes.map { p =>
      val scored = emb.filter(_._1 != p).map { case (id, v) =>
        val dot = fxDot(v, byId(p)).toDouble / 1e15
        (id, dot / (nrm(id) * nrm(p)))
      }
      val cand = scored.sortBy { case (id, c) => (-c, id) }.take(10)
        .map { case (id, _) => id -> fxDot(byId(id), byId(p)) }
      val sel1 = cand.maxBy { case (id, rel) => (rel, -id) }
      def sim(a: Long, b: Long) = fxDot(byId(a), byId(b))
      val rest2 = cand.filter(_._1 != sel1._1).map { case (id, rel) =>
        (id, (7 * rel - 3 * sim(id, sel1._1)) / 10)
      }
      val sel2 = rest2.maxBy { case (id, m) => (m, -id) }
      val rest3 = cand
        .filter(c => c._1 != sel1._1 && c._1 != sel2._1)
        .map { case (id, rel) =>
          (id, (7 * rel - 3 * math.max(sim(id, sel1._1),
            sim(id, sel2._1))) / 10)
        }
      val sel3 = rest3.maxBy { case (id, m) => (m, -id) }
      p -> (sel1._1, sel1._2, sel2._1, sel2._2, sel3._1, sel3._2)
    }.toMap
    val got = graft.queries.Wave24.retrievalMmr
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (p, g) => assert(g == want(p), s"probe $p") }
  }
}
