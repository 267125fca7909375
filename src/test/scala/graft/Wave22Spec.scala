package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 22 invariants: the binseg argmax against a sequential scan of
  * every split, and the isotonic fit's monotonicity + optimality
  * versus a reference PAV implementation.
  */
class Wave22Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_changepoint_binseg equals a sequential split scan") {
    val byMonth = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_orderdate", "o_totalprice").collect()
      .map { r =>
        val ts = r.getTimestamp(0).toLocalDateTime
        (ts.getYear * 100L + ts.getMonthValue,
          math.round(r.getDouble(1) * 100) / 100)
      }
      .groupBy(_._1).map { case (m, g) =>
        (m, g.map(_._2).sum, g.length.toLong)
      }.toSeq.sortBy(_._1)
    val st = byMonth.map(_._2).sum
    val nt = byMonth.map(_._3).sum
    val want = byMonth.inits.toSeq.reverse.drop(1)
      .filter(pre => pre.map(_._3).sum < nt)
      .map { pre =>
        val sl = pre.map(_._2).sum
        val nl = pre.map(_._3).sum
        val g = (BigInt(sl) * sl / nl +
          BigInt(st - sl) * (st - sl) / (nt - nl)) / nt
        (pre.last._1, nl, nt - nl, sl, st - sl, g.toLong)
      }
    val bestScore = want.map(_._6).max
    val bestMonth = want.filter(_._6 == bestScore).map(_._1).min
    val got = graft.queries.Wave22.changepointBinseg
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == want.size)
    got.zip(want).foreach { case (r, (m, nl, nr, sl, sr, sc)) =>
      assert(r.getLong(0) == m && r.getLong(1) == nl && r.getLong(2) == nr)
      assert(r.getLong(3) == sl && r.getLong(4) == sr)
      assert(r.getLong(5) == sl / nl && r.getLong(6) == sr / nr)
      assert(r.getLong(7) == sc)
      assert(r.getLong(8) == (if (m == bestMonth) 1L else 0L))
    }
    assert(got.map(_.getLong(8)).sum == 1L)
  }

  /** Reference PAV: pool-adjacent-violators over (pos, n) buckets with
    * exact rational comparisons, then each pool's rate in truncating
    * ppm — the classic algorithm, independent of the minimax form. */
  private def pav(buckets: Seq[(Long, Long)]): Seq[Long] = {
    case class Pool(pos: Long, n: Long, size: Int)
    val pools = scala.collection.mutable.ArrayBuffer.empty[Pool]
    buckets.foreach { case (p, n) =>
      pools += Pool(p, n, 1)
      // merge while the last pool's rate < the previous pool's rate
      while (pools.length >= 2 &&
        pools(pools.length - 1).pos * pools(pools.length - 2).n <
          pools(pools.length - 2).pos * pools(pools.length - 1).n) {
        val b = pools.remove(pools.length - 1)
        val a = pools.remove(pools.length - 1)
        pools += Pool(a.pos + b.pos, a.n + b.n, a.size + b.size)
      }
    }
    pools.flatMap(p =>
      Seq.fill(p.size)(p.pos * 1000000L / p.n)).toSeq
  }

  test("q_isotonic_calibration is monotone and equals reference PAV") {
    val got = graft.queries.Wave22.isotonicCalibration
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    // monotone nondecreasing fitted curve, and raw rate recomputes
    got.sliding(2).foreach {
      case Array((_, _, _, _, a), (_, _, _, _, b)) => assert(a <= b)
      case _ =>
    }
    got.foreach { case (_, pos, neg, rate, _) =>
      assert(rate == pos * 1000000L / (pos + neg))
    }
    val wantIso = pav(got.map(g => (g._2, g._2 + g._3)).toSeq)
    got.map(_._5).zip(wantIso).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"bucket index $i")
    }
  }
}
