package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 39 invariants: CUPED readout vs a sequential BigInt replay
  * (plus variance-reduction sanity), embedding shift vs a sequential
  * mean-gap replay (plus symmetry-free pair coverage).
  */
class Wave39Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_ab_cuped equals a sequential BigInt replay and reduces variance") {
    val rows = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "unix_millis(CAST(o_orderdate AS TIMESTAMP))",
        "CAST(ROUND(o_totalprice * 100, 0) AS LONG)",
        "md5(CAST(CAST(o_custkey AS STRING) AS BINARY)) < '80'")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val split = 820454400000L
    val byCust = rows.groupBy(_._1).toSeq.map { case (ck, g) =>
      val pre = g.filter(_._2 < split).map(_._3).sum
      val post = g.filter(_._2 >= split).map(_._3).sum
      (ck, g.head._4, BigInt(pre), BigInt(post))
    }
    val n = BigInt(byCust.size)
    val sp = byCust.map(_._3).sum; val ss = byCust.map(_._4).sum
    val spp = byCust.map(u => u._3 * u._3).sum
    val sps = byCust.map(u => u._3 * u._4).sum
    val sss = byCust.map(u => u._4 * u._4).sum
    val a = byCust.filter(_._2); val b = byCust.filterNot(_._2)
    val (na, nb) = (BigInt(a.size), BigInt(b.size))
    val (spa, ssa) = (a.map(_._3).sum, a.map(_._4).sum)
    val (spb, ssb) = (b.map(_._3).sum, b.map(_._4).sum)
    val varPreNum = n * spp - sp * sp
    val theta = if (varPreNum == 0) BigInt(0)
      else (n * sps - sp * ss) * 1000000 / varPreNum
    val mp = sp / n
    val M = BigInt(1000000)
    def adjMean(nn: BigInt, spx: BigInt, ssx: BigInt): BigInt =
      (ssx * M - theta * spx + nn * theta * mp) / nn
    val rawDiff = ssa * M / na - ssb * M / nb
    val cupedDiff = adjMean(na, spa, ssa) - adjMean(nb, spb, ssb)
    val sadj = M * ss - theta * sp + n * theta * mp
    val sadj2 = M * M * sss - BigInt(2000000) * theta * (sps - mp * ss) +
      theta * theta * (spp - BigInt(2) * mp * sp + n * mp * mp)
    val vadj = n * sadj2 - sadj * sadj
    val vq = n * sss - ss * ss
    val vr = vadj / vq / M
    val got = graft.queries.Wave39.abCuped
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == na.toLong && r.getLong(1) == nb.toLong)
    assert(r.getLong(2) == theta.toLong, s"theta ${r.getLong(2)} vs $theta")
    assert(r.getLong(3) == rawDiff.toLong)
    assert(r.getLong(4) == cupedDiff.toLong)
    assert(r.getLong(5) == vr.toLong)
    // CUPED with the OLS-optimal pooled theta cannot increase variance
    // (beyond integer truncation slack)
    assert(r.getLong(5) <= 1010000L, s"vr_ppm=${r.getLong(5)}")
    assert(r.getLong(5) > 0L)
  }

  test("q_embedding_shift equals a sequential mean-gap replay over " +
    "all label pairs") {
    val emb = Tables.load(spark, SharedSpark.sf001, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getAs[Number](0).longValue,
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong)))
    val byLabel = emb.groupBy(_._1).toSeq.sortBy(_._1)
    val sums = byLabel.map { case (l, g) =>
      val s = new Array[BigInt](64).map(_ => BigInt(0))
      g.foreach { case (_, v) => v.indices.foreach(i => s(i) += v(i)) }
      (l, BigInt(g.length), s)
    }
    val want = (for {
      (la, na, sa) <- sums; (lb, nb, sb) <- sums if la < lb
    } yield {
      val gap2 = (0 until 64).map { i =>
        val d = nb * sa(i) - na * sb(i); d * d
      }.sum / (na * na * nb * nb)
      (la, lb, na.toLong, nb.toLong, gap2.toLong)
    }).sortBy(t => (t._1, t._2))
    val got = graft.queries.Wave39.embeddingShift
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want && got.nonEmpty)
  }
}
