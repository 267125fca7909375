package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 58 invariants: the power-iteration PCA against a full BigInt
  * recompute from the raw floats (plus a double-precision direction
  * sanity check), and priority sampling against a sequential
  * sort-and-price recompute with the DLT axioms.
  */
class Wave58Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val Dim = 64
  private val Rounds = 12
  private val Shift = 4194304L

  test("q_embed_pca_power equals a BigInt recompute and points along " +
    "the double-precision principal direction") {
    val vecs = Tables.load(spark, SharedSpark.sf001, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
      .map(_._2)
    val fx = vecs.map(v =>
      Array.tabulate(Dim)(i => BigInt(math.floor(v(i).toDouble * 1e6).toLong)))
    val n = BigInt(fx.length)
    val m = Array.tabulate(Dim)(i => fx.map(_(i)).sum)
    val s2 = Array.tabulate(Dim, Dim)((i, j) =>
      fx.map(r => r(i) * r(j)).sum)
    val c = Array.tabulate(Dim, Dim)((i, j) => (n * s2(i)(j) - m(i) * m(j)) / Shift)
    def matvec(v: Array[BigInt]) = Array.tabulate(Dim)(i =>
      (0 until Dim).foldLeft(BigInt(0))((a, j) => a + c(i)(j) * v(j)))
    var v = Array.fill(Dim)(BigInt(1000000))
    var prev = v
    (1 to Rounds).foreach { _ =>
      prev = v
      val y = matvec(v)
      val mx = y.map(_.abs).max
      v = y.map(_ * 1000000 / mx)
    }
    val yf = matvec(v)
    val lam = (v.indices.foldLeft(BigInt(0))((a, i) => a + yf(i) * v(i)) /
      v.indices.foldLeft(BigInt(0))((a, i) => a + v(i) * v(i))).toLong
    val got = graft.queries.Wave58.embedPcaPower
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val want = (0 until Dim).map(i =>
      ((i + 1).toLong, v(i).toLong, prev(i).toLong, lam, n.toLong))
    assert(got == want)
    // max-normalization: some component is exactly +/-1e6, none exceeds
    assert(got.map(_._2.abs).max == 1000000L)
    // covariance is PSD, so the Rayleigh quotient is non-negative
    assert(lam >= 0L)
    // fixed-point faithfulness (tolerance check only — never part of
    // the hash contract): the integer iterate must track a DOUBLE
    // power iteration run for the SAME 12 rounds from the same start.
    // (The synthetic corpus is near-isotropic — lambda2/lambda1 ~ 0.93
    // at sf0.001 — so no fixed round count recovers the infinite-round
    // eigenvector; the contract is the fixed-round iterate, like every
    // fixed-round graph kernel in the registry.)
    val nn = vecs.length
    val md = Array.tabulate(Dim)(i => vecs.map(_(i).toDouble).sum / nn)
    val cd = Array.tabulate(Dim, Dim)((i, j) =>
      vecs.map(r => (r(i) - md(i)) * (r(j) - md(j))).sum / nn)
    def rayleigh(x: Array[Double]): Double = {
      val y = Array.tabulate(Dim)(i => (0 until Dim).map(j => cd(i)(j) * x(j)).sum)
      (0 until Dim).map(i => y(i) * x(i)).sum /
        (0 until Dim).map(i => x(i) * x(i)).sum
    }
    var w = Array.fill(Dim)(1.0)
    (1 to Rounds).foreach { _ =>
      val y = Array.tabulate(Dim)(i =>
        (0 until Dim).map(j => cd(i)(j) * w(j)).sum)
      val mx = y.map(math.abs).max
      w = y.map(_ / mx)
    }
    val vd = got.map(_._2.toDouble).toArray
    val cos = (0 until Dim).map(i => vd(i) * w(i)).sum /
      (math.sqrt(vd.map(x => x * x).sum) * math.sqrt(w.map(x => x * x).sum))
    assert(cos > 0.999, s"fixed-point vs double same-round cosine $cos")
    // power iteration improves the Rayleigh quotient over the start
    assert(rayleigh(vd) > rayleigh(Array.fill(Dim)(1.0)))
  }

  test("q_sample_priority equals a sequential sort-and-price recompute " +
    "and satisfies the DLT axioms") {
    val orders = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_orderkey", "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def u32(okey: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ps:$okey".getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val prio = orders.map { case (okey, cents) =>
      val u = u32(okey) + 1
      (okey, cents, u, cents * 4294967296L / u)
    }
    val ranked = prio.sortBy(t => (-t._4, t._1))
    val k = 50
    val tau = ranked(k)._4
    val want = ranked.take(k)
      .map(t => (t._1, t._2, t._3, t._4, math.max(t._2, tau)))
      .sortBy(_._1).toSeq
    val estTotal = want.map(_._5).sum
    val total = orders.map(_._2).sum
    val got = graft.queries.Wave58.samplePriority
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) == want)
    assert(got.forall(t => t._6 == tau && t._7 == estTotal &&
      t._8 == total && t._9 == orders.length.toLong))
    // DLT axioms: every sampled priority clears the threshold, every
    // estimate weight is max(w, tau), and the estimator prices small
    // weights AT tau (threshold pricing)
    assert(got.forall(t => t._4 >= tau))
    assert(got.forall(t => t._5 == math.max(t._2, tau)))
    assert(got.length == k)
  }
}
