package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 37 invariants: the cross-exchange as-of spread report equals a
  * sequential LOCF replay, and its arbitrage axioms hold.
  */
class Wave37Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_price_spread_asof equals a sequential LOCF recompute") {
    val orders = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_orderkey", "unix_millis(CAST(o_orderdate AS TIMESTAMP))",
        "CAST(ROUND(o_totalprice * 100, 0) AS LONG)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // quote stream: (ei, day, okey, cents, q_ms)
    val quotes = orders.map { case (okey, dayMs, cents) =>
      (okey % 5, dayMs, okey, cents, dayMs + (okey * 104729L) % 86400000L)
    }
    // closing quote per (ei, day)
    val eod = quotes.groupBy(q => (q._1, q._2)).map { case (k, g) =>
      k -> g.maxBy(q => (q._5, q._3))._4
    }
    val days = orders.map(_._2).distinct.sorted
    // LOCF fill per exchange over the day grid
    val px = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (ei <- 0L to 4L) {
      var cur: Option[Long] = None
      for (d <- days) {
        eod.get((ei, d)).foreach(c => cur = Some(c))
        cur.foreach(c => px((ei, d)) = c)
      }
    }
    val want = days.flatMap { d =>
      val priced = (0L to 4L).flatMap(ei => px.get((ei, d)).map(ei -> _))
      if (priced.size < 5) None
      else {
        val hi = priced.maxBy { case (ei, p) => (p, -ei) }
        val lo = priced.minBy { case (ei, p) => (p, ei) }
        Some((d / 86400000L, lo._1, lo._2, hi._1, hi._2, hi._2 - lo._2))
      }
    }.sortBy { case (day, _, _, _, _, sp) => (-sp, day) }.take(20)
    val names = graft.ingest.Prices.exchanges
    val got = graft.queries.Wave37.priceSpreadAsof
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
    val wantNamed = want.map { case (day, loEi, loC, hiEi, hiC, sp) =>
      (day, names(loEi.toInt), loC, names(hiEi.toInt), hiC, sp)
    }
    assert(got.toSeq == wantNamed.toSeq)
    assert(got.nonEmpty)
    // arbitrage axioms: spread nonnegative, hi >= lo, distinct exchanges
    got.foreach { case (_, loX, loC, hiX, hiC, sp) =>
      assert(sp == hiC - loC && sp >= 0)
      assert(sp == 0 || loX != hiX)
    }
  }
}
