package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 59 invariants: the periodogram against a sequential DFT
  * recompute from the raw rows, FD discovery against a sequential g3
  * recompute plus the key/violation axioms.
  */
class Wave59Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_ts_periodogram equals a sequential integer DFT recompute") {
    val rows = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("unix_millis(o_orderdate) div 86400000",
        "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = rows.groupBy(_._1).map { case (d, g) => (d, g.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val nd = days.length.toLong
    val md = days.map(_._2).sum / nd
    val periods = Seq(7, 30, 91)
    val want = periods.map { p =>
      var a = 0L; var b = 0L
      days.foreach { case (day, cents) =>
        val k = (day % p).toInt
        val rc = cents - md
        a += rc * math.round(math.cos(2 * math.Pi * k / p) * 10000)
        b += rc * math.round(math.sin(2 * math.Pi * k / p) * 10000)
      }
      (p.toLong, a, b, BigInt(a) * a + BigInt(b) * b)
    }
    val t2 = want.map(_._4).sum
    val mx = want.map(_._4).max
    val wantRows = want.map { case (p, a, b, p2) =>
      (p, a, b, (p2 * 1000000 / t2).toLong, if (p2 == mx) 1L else 0L, nd)
    }
    val got = graft.queries.Wave59.tsPeriodogram
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == wantRows)
    // shares sum to <= 1e6 (truncation) and within 3 ulps of it;
    // exactly one dominant period unless powers tie
    val shares = got.map(_._4).sum
    assert(shares <= 1000000L && shares >= 1000000L - 3)
    assert(got.map(_._5).sum >= 1L)
  }

  test("q_fd_discovery equals a sequential g3 recompute and satisfies " +
    "the key axioms") {
    val fds = Seq(
      ("customer:c_nationkey->c_mktsegment", "customer", "c_nationkey",
        "c_mktsegment"),
      ("lineitem:l_orderkey->l_returnflag", "lineitem", "l_orderkey",
        "l_returnflag"),
      ("lineitem:l_partkey->l_suppkey", "lineitem", "l_partkey",
        "l_suppkey"),
      ("orders:o_custkey->o_orderpriority", "orders", "o_custkey",
        "o_orderpriority"),
      ("orders:o_orderkey->o_orderstatus", "orders", "o_orderkey",
        "o_orderstatus"),
      ("part:p_brand->p_type", "part", "p_brand", "p_type"))
    val want = fds.map { case (name, t, lhs, rhs) =>
      val pairs = Tables.load(spark, SharedSpark.sf001, t)
        .selectExpr(s"CAST($lhs AS STRING)", s"CAST($rhs AS STRING)")
        .collect().map(r => (r.getString(0), r.getString(1)))
      val byKey = pairs.groupBy(_._1)
      val nRows = pairs.length.toLong
      val nKeys = byKey.size.toLong
      val nViol = byKey.valuesIterator.count(_.map(_._2).distinct.size > 1).toLong
      val g3 = nRows - byKey.valuesIterator
        .map(g => g.groupBy(_._2).valuesIterator.map(_.length).max.toLong).sum
      (name, nRows, nKeys, nViol, g3, g3 * 1000000L / nRows,
        if (g3 == 0) 1L else 0L)
    }.sortBy(_._1)
    val got = graft.queries.Wave59.fdDiscovery
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    // the primary key FD must hold; a violating FD must have
    // violating keys; g3 rows never reach the row count
    assert(got.find(_._1.startsWith("orders:o_orderkey")).get._7 == 1L)
    assert(got.forall(t => (t._5 == 0L) == (t._4 == 0L)))
    assert(got.forall(t => t._5 < t._2))
    assert(got.exists(_._7 == 0L)) // at least one false FD at every SF
  }
}
