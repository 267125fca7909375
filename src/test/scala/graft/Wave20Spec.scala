package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave 20 invariants: the privacy-audit classes against a sequential
  * recompute, and the bitemporal restatement identities.
  */
class Wave20Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q_kanon_audit equals a sequential recompute of the classes") {
    val orders = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sens = orders.groupBy(_._1).map { case (ck, os) =>
      ck -> os.groupBy(_._2).toSeq
        .map { case (p, g) => (p, g.size) }
        .sortBy { case (p, n) => (-n, p) }.head._1
    }
    val cust = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Number](2).longValue,
        math.round(r.getDouble(3) * 100) / 100000L))
      .filter(c => sens.contains(c._1))
    val eq = cust.groupBy(c => (c._2, c._3, c._4)).map { case (qi, g) =>
      qi -> (g.length.toLong, g.map(c => sens(c._1)).distinct.length.toLong)
    }
    val n = eq.values.map(_._1).sum
    val nSup = eq.values.collect {
      case (k, l) if k < 5 || l < 2 => k
    }.sum
    val supPpm = nSup * 1000000L / n
    val got = graft.queries.Wave20.kanonAudit
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7)))
    assert(got.length == eq.size)
    got.foreach { case (qi, (k, l, kOk, lOk, sp)) =>
      val (wk, wl) = eq(qi)
      assert(k == wk && l == wl, s"class $qi")
      assert(kOk == (if (k >= 5) 1L else 0L))
      assert(lOk == (if (l >= 2) 1L else 0L))
      assert(sp == supPpm)
    }
  }

  test("q_bitemporal_restate: as_was + restated == as_is and the " +
    "arms recompute from raw rows") {
    val orders = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_orderkey", "o_orderdate", "o_totalprice").collect()
      .map { r =>
        val ts = r.getTimestamp(1).toLocalDateTime
        (ts.getYear * 100L + ts.getMonthValue,
          math.round(r.getDouble(2) * 100),
          md5hex(r.getLong(0).toString) < "1")
      }
    val want = orders.groupBy(_._1).map { case (m, g) =>
      val asIs = g.map(_._2).sum
      val asWas = g.filterNot(_._3).map(_._2).sum
      m -> (asWas, asIs, g.count(_._3).toLong, g.length.toLong)
    }
    val got = graft.queries.Wave20.bitemporalRestate
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == want.size)
    got.foreach { case (m, asWas, asIs, restated, nLate, n, ppm) =>
      val (wWas, wIs, wLate, wN) = want(m)
      assert(asWas == wWas && asIs == wIs && nLate == wLate && n == wN,
        s"month $m")
      assert(asWas + restated == asIs)
      assert(ppm == (if (asIs > 0) restated * 1000000L / asIs else 0L))
    }
  }
}
