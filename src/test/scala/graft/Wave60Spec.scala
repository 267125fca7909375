package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 60 invariants: the theta/KMV intersection sketch against a
  * sequential bottom-k recompute (plus the KMV error-band axiom), and
  * the geometric-mechanism release against an independent
  * exact-rational CDF replay.
  */
class Wave60Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val K = 128

  private def u48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (0 until 6).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
  }

  private def u32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (0 until 4).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
  }

  test("q_sketch_theta equals a sequential bottom-k recompute and the " +
    "union estimate lands inside the KMV error band") {
    val m = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)",
        "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(t => t._1 == 1995L || t._1 == 1996L).distinct
    // mirror the engine: DISTINCT hash values first, then bottom-K —
    // a pair-sorted take(K) would under-fill the sketch on a collision
    def sketch(yr: Long): Seq[Long] =
      m.filter(_._1 == yr).iterator.map(t => u48(s"th:${t._2}"))
        .toSeq.distinct.sorted.take(K)
    val sa = sketch(1995L).toSet
    val sb = sketch(1996L).toSet
    val l = (sa ++ sb).toSeq.sorted.take(K)
    val klmax = l.max
    val nCommon = l.count(h => sa(h) && sb(h)).toLong
    val unionEst = (K - 1).toLong * 281474976710656L / klmax
    val interEst = nCommon * unionEst / K
    val jac = nCommon * 1000000L / K
    val byCk = m.groupBy(_._2)
    val exactUnion = byCk.size.toLong
    val exactInter = byCk.valuesIterator.count(_.map(_._1).distinct.size == 2)
      .toLong
    val got = graft.queries.Wave60.sketchTheta
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getLong(8)) ==
      ((K.toLong, klmax, l.length.toLong, nCommon, unionEst, interEst,
        jac, exactUnion, exactInter)))
    // KMV union error band: |est - exact| within 3/sqrt(K-1) relative
    // (~27% at K=128) of the exact distinct union
    assert((unionEst - exactUnion).abs.toDouble / exactUnion <= 0.27,
      s"union est $unionEst vs exact $exactUnion")
    assert(interEst <= unionEst && jac <= 1000000L)
  }

  test("q_dp_geometric equals an exact-rational inverse-CDF replay " +
    "and satisfies the mechanism axioms") {
    // independent threshold derivation: truncated two-sided geometric,
    // alpha = 3/4, k in [-8, 8], cumulative scaled to 2^32
    val ks = (-8 to 8)
    val w = ks.map(k => BigInt(3).pow(k.abs) * BigInt(4).pow(8 - k.abs))
    val tot = w.sum
    val cum = w.scanLeft(BigInt(0))(_ + _).tail
      .map(c => (c * BigInt(4294967296L) / tot).toLong)
    assert(cum == cum.sorted && cum.last == 4294967296L)
    def noise(u: Long): Long =
      ks(cum.indexWhere(u < _) match { case -1 => ks.length - 1; case i => i })
        .toLong
    val counts = Tables.load(spark, SharedSpark.sf001, "orders")
      .groupBy("o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val want = counts.map { case (pri, c) =>
      val nz = noise(u32(s"dp:$pri"))
      (pri, c, nz, math.max(c + nz, 0L), 287682L)
    }.toSeq
    val got = graft.queries.Wave60.dpGeometric
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want)
    assert(got.forall(t => t._3.abs <= 8 && t._4 >= 0))
    // the advertised privacy parameter is ln(1/alpha) = ln(4/3)
    assert(math.round(math.log(4.0 / 3.0) * 1e6) == 287682L)
  }
}
