package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 62 invariants: the isotropy spectrum against a BigInt + fxlog2
  * recompute (with the share/entropy axioms), and the SPRT against a
  * sequential walk replay.
  */
class Wave62Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val Dim = 64

  test("q_embed_isotropy equals a BigInt/fxlog2 recompute and the " +
    "entropy respects its bounds") {
    val vecs = Tables.load(spark, SharedSpark.sf001, "embeddings")
      .selectExpr("embedding").collect().map(_.getSeq[Float](0).toArray)
    val n = BigInt(vecs.length)
    val vars = (0 until Dim).map { i =>
      val xs = vecs.map(v => BigInt(math.floor(v(i).toDouble * 1e6).toLong))
      val m = xs.sum
      val s2 = xs.map(x => x * x).sum
      ((n * s2 - m * m) / (n * n)).toLong
    }
    val trace = vars.sum
    val lgT = graft.plans.FxLog2.fxlog2(trace)
    val hQ30 = (vars.filter(_ > 0).map(v =>
      BigInt(v) * (lgT - graft.plans.FxLog2.fxlog2(v))).sum / trace).toLong
    val isoPpm = (BigInt(hQ30) * 1000000 / 6442450944L).toLong
    val want = (0 until Dim).map(i =>
      ((i + 1).toLong, vars(i), (BigInt(vars(i)) * 1000000 / trace).toLong,
        trace, hQ30, isoPpm))
    val got = graft.queries.Wave62.embedIsotropy
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // shares sum to <= 1e6, entropy inside [0, log2(64)] in Q30, and
    // the synthetic near-isotropic corpus reads close to isotropic
    assert(got.map(_._3).sum <= 1000000L)
    assert(hQ30 >= 0 && hQ30 <= 6L * (1L << 30))
    assert(isoPpm > 900000L, s"iso_ppm $isoPpm")
  }

  test("q_ab_sprt equals a sequential LLR walk replay") {
    val incPos = math.round(math.log(0.25 / 0.20) * (1L << 20))
    val incNeg = math.round(math.log(0.75 / 0.80) * (1L << 20))
    val bound = math.round(math.log(0.95 / 0.05) * (1L << 20))
    val evs = Tables.load(spark, SharedSpark.sf001, "events")
      .selectExpr("unix_millis(ts)", "event_id",
        "CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    var cum = 0L
    var up = -1L
    var dn = -1L
    evs.zipWithIndex.foreach { case ((_, _, x), idx) =>
      cum += (if (x == 1) incPos else incNeg)
      if (up == -1 && cum >= bound) up = idx + 1
      if (dn == -1 && cum <= -bound) dn = idx + 1
    }
    val decision =
      if (up != -1 && (dn == -1 || up < dn)) 1L
      else if (dn != -1) -1L else 0L
    val got = graft.queries.Wave62.abSprt
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((evs.length.toLong, evs.map(_._3).sum, cum, up, dn, decision,
        bound)))
    // the walk's final value is consistent with its parts
    assert(cum == evs.map(_._3).sum * incPos +
      (evs.length - evs.map(_._3).sum) * incNeg)
  }
}
