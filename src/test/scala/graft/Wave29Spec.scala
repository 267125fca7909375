package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 29 invariants: IV against a BigInt moment recompute, raking
  * against a sequential IPF plus its margin-improvement property.
  */
class Wave29Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_causal_iv equals a sequential BigInt recompute") {
    val size = Tables.load(spark, SharedSpark.sf001, "part")
      .select("p_partkey", "p_size").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val rows = Tables.load(spark, SharedSpark.sf001, "lineitem")
      .select("l_partkey", "l_returnflag", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getString(1), size(r.getLong(0)),
        math.round(r.getDouble(2)), math.round(r.getDouble(3) * 100)))
    val want = rows.groupBy(_._1).flatMap { case (flag, g) =>
      val n = BigInt(g.length)
      def s(f: ((String, Long, Long, Long)) => Long) =
        g.map(e => BigInt(f(e))).sum
      val (sz, sx, sy) = (s(_._2), s(_._3), s(_._4))
      def s2(f: ((String, Long, Long, Long)) => (Long, Long)) =
        g.map { e => val (a, b) = f(e); BigInt(a) * b }.sum
      val szz = s2(e => (e._2, e._2)); val sxx = s2(e => (e._3, e._3))
      val szx = s2(e => (e._2, e._3)); val szy = s2(e => (e._2, e._4))
      val sxy = s2(e => (e._3, e._4))
      def m(ab: BigInt, a: BigInt, b: BigInt) = ab - a * b / n
      val (mzx, mxx, mzz) = (m(szx, sz, sx), m(sxx, sx, sx), m(szz, sz, sz))
      if (mzx == 0 || mxx == 0 || mzz == 0) None
      else Some(flag -> (
        (m(sxy, sx, sy) * 1000000 / mxx).toLong,
        (m(szy, sz, sy) * 1000000 / mzx).toLong,
        (mzx * 1000000 / mzz).toLong))
    }
    val got = graft.queries.Wave29.causalIv
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == want.size && got.nonEmpty)
    got.foreach { r =>
      val (ols, iv, fs) = want(r.getString(0))
      assert(r.getLong(2) == ols && r.getLong(3) == iv &&
        r.getLong(4) == fs, s"flag ${r.getString(0)}")
    }
  }

  test("q_weight_raking equals a sequential IPF and moves margins " +
    "toward targets") {
    val nations = Tables.load(spark, SharedSpark.sf001, "nation")
      .select("n_nationkey", "n_regionkey").collect()
      .map(r => r.getAs[Number](0).longValue ->
        r.getAs[Number](1).longValue).toMap
    val cust = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey", "c_mktsegment", "c_nationkey").collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        nations(r.getAs[Number](2).longValue))))
      .toMap
    val cells = cust.values.groupBy(identity)
      .map { case (k, g) => k -> g.size.toLong }
    val nt = cells.values.sum
    val rev = scala.collection.mutable.Map.empty[(String, Long), Long]
    Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_custkey", "o_totalprice").collect()
      .foreach { r =>
        val k = cust(r.getLong(0))
        rev(k) = rev.getOrElse(k, 0L) + math.round(r.getDouble(1) * 100)
      }
    val rvt = rev.values.sum
    def margin[K](group: ((String, Long)) => K): Map[K, Long] =
      rev.toSeq.groupBy(e => group(e._1))
        .map { case (k, g) => k -> g.map(_._2).sum * nt / rvt }
    val tseg = margin(_._1); val treg = margin(_._2)
    var w = cells.map { case (k, n) => k -> n * 1000000L }
    for (_ <- 1 to 4) {
      val rs = w.toSeq.groupBy(_._1._1)
        .map { case (s, g) => s -> g.map(_._2).sum }
      w = w.map { case (k, v) =>
        val f = tseg(k._1) * 1000000L * 1000000L / rs(k._1)
        k -> (BigInt(v) * f / 1000000L).toLong
      }
      val cs = w.toSeq.groupBy(_._1._2)
        .map { case (r, g) => r -> g.map(_._2).sum }
      w = w.map { case (k, v) =>
        val f = treg(k._2) * 1000000L * 1000000L / cs(k._2)
        k -> (BigInt(v) * f / 1000000L).toLong
      }
    }
    val got = graft.queries.Wave29.weightRaking
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getAs[Number](1).longValue) ->
        ((r.getLong(2), r.getLong(3))))
    assert(got.length == cells.size)
    got.foreach { case (k, (n, wf)) =>
      assert(n == cells(k) && wf == w(k), s"cell $k")
    }
    // after the final column step, region margins match targets to
    // within rounding (25 cells x 1 unit of truncation each)
    val regSum = got.groupBy(_._1._2)
      .map { case (r, g) => r -> g.map(_._2._2).sum }
    regSum.foreach { case (r, s) =>
      assert(math.abs(s - treg(r) * 1000000L) <= 25L * 1000000L)
    }
  }
}
