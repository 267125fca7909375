package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 21 invariants: Viterbi against a sequential trellis recompute,
  * and rank-1 ALS against a sequential fixed-point recompute.
  */
class Wave21Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // The same model constants as Wave21 (restated independently so a
  // constant edit in either place fails the test).
  private val emis = Map(
    0 -> Map("view" -> 0L, "click" -> -100L, "signup" -> -400L,
      "purchase" -> -1600L, "error" -> -300L),
    1 -> Map("view" -> -300L, "click" -> -120L, "signup" -> -150L,
      "purchase" -> -80L, "error" -> -700L))
  private val trans =
    Map((0, 0) -> -50L, (0, 1) -> -500L, (1, 0) -> -450L, (1, 1) -> -60L)
  private val init = Map(0 -> 0L, 1 -> -250L)

  private def viterbi(obs: Seq[String]): (String, Long, String) = {
    var dp = Array(init(0) + emis(0)(obs.head), init(1) + emis(1)(obs.head))
    val bps = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    obs.tail.foreach { o =>
      val bp = Array.ofDim[Int](2)
      val nd = Array.ofDim[Long](2)
      for (sp <- 0 to 1) {
        val c0 = dp(0) + trans((0, sp))
        val c1 = dp(1) + trans((1, sp))
        bp(sp) = if (c0 >= c1) 0 else 1
        nd(sp) = math.max(c0, c1) + emis(sp)(o)
      }
      bps += bp; dp = nd
    }
    val fin = if (dp(0) >= dp(1)) 0 else 1
    val states = scala.collection.mutable.ArrayBuffer(fin)
    bps.reverse.foreach(bp => states.prepend(bp(states.head)))
    val path = states.map(s => if (s == 0) 'C' else 'I').mkString
    (path, math.max(dp(0), dp(1)), if (fin == 0) "C" else "I")
  }

  test("q_hmm_viterbi equals a sequential trellis recompute") {
    val ev = Tables.load(spark, SharedSpark.sf001, "events")
      .selectExpr("user_id", "event_type", "unix_millis(ts) AS ms",
        "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).collect {
      case (u, g) if g.length >= 6 =>
        val last6 = g.sortBy(e => (-e._3, -e._4)).take(6).reverse
        u -> viterbi(last6.map(_._2).toSeq)
    }
    val got = graft.queries.Wave21.hmmViterbi
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getString(3))))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (u, (path, score, fin)) =>
      val (wp, ws, wf) = want(u)
      assert(path == wp && score == ws && fin == wf, s"user $u")
    }
  }

  test("q_als_rank1 equals a sequential fixed-point ALS recompute") {
    val ord = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ratings = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity").collect()
      .map(r => ((ord(r.getLong(0)), r.getLong(1)),
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }
    val uUnit = ratings.groupBy(_._1._1).map { case (ck, g) =>
      val sr = g.values.sum
      val n = g.size.toLong
      ck -> sr * 1000 * 1000 / (n * 1000 * 1000)
    }
    val vMilli = ratings.groupBy(_._1._2).flatMap { case (pk, g) =>
      val num = g.toSeq.map { case ((ck, _), r) => r * uUnit(ck) }.sum
      // toSeq before map: g.keys is a Set, and mapping it would dedup
      // equal uUnit^2 terms out of the sum
      val den = g.keys.toSeq.map { case (ck, _) => uUnit(ck) * uUnit(ck) }.sum
      if (den > 0) Some(pk -> num * 1000 / den) else None
    }
    val want = ratings.toSeq
      .filter { case ((_, pk), _) => vMilli.contains(pk) }
      .map { case ((ck, pk), r) =>
        val err = (r * 1000 - uUnit(ck) * vMilli(pk)) / 1000
        (ck, err)
      }
      .groupBy(_._1).map { case (ck, g) =>
        val sse = g.map(e => e._2 * e._2).sum
        val n = g.length.toLong
        ck -> (uUnit(ck), n, sse,
          math.floor(math.sqrt((sse / n).toDouble)).toLong)
      }
    val got = graft.queries.Wave21.alsRank1
      .run(spark, SharedSpark.sf001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { case (ck, (u, n, sse, rmse)) =>
      val (wu, wn, wsse, wr) = want(ck)
      assert(u == wu && n == wn && sse == wsse && rmse == wr, s"cust $ck")
    }
  }
}
