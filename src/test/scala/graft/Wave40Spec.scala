package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 40 invariants: RBO vs a sequential recompute over the shared
  * rankings (plus range axioms), IPW ATE vs a sequential BigInt
  * replay (plus the poststratification identity at one bin).
  */
class Wave40Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_retrieval_rbo equals a sequential recompute over the shared " +
    "top-20 rankings and stays in [0, 1e12]") {
    val sp = graft.queries.RetrievalShared
      .sparseTop20(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val de = graft.queries.RetrievalShared
      .denseTop20(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // suffix weights, replayed independently with BigDecimal
    val p = BigDecimal("0.9")
    val wd = (1 to 20).map(d =>
      ((BigDecimal(1) - p) * p.pow(d - 1) * BigDecimal(1000000000000L))
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLongExact)
    val wsuf = (1 to 20).map(m => (m to 20).map(d => wd(d - 1) / d).sum)
    val spByProbe = sp.groupBy(_._1); val deByProbe = de.groupBy(_._1)
    val probes = spByProbe.keySet.intersect(deByProbe.keySet).toSeq.sorted
    val want = probes.map { pid =>
      val rsOf = spByProbe(pid).map(t => t._2 -> t._3).toMap
      val rdOf = deByProbe(pid).map(t => t._2 -> t._3).toMap
      val shared = rsOf.keySet.intersect(rdOf.keySet)
      val rbo = shared.iterator
        .map(id => wsuf(math.max(rsOf(id), rdOf(id)) - 1)).sum
      (pid, rbo, shared.size.toLong)
    }
    val got = graft.queries.Wave40.retrievalRbo
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want && got.nonEmpty)
    got.foreach { case (_, rbo, ov) =>
      assert(rbo >= 0 && rbo <= 1000000000000L)
      assert((ov == 0) == (rbo == 0))
    }
  }

  test("q_causal_ipw equals a sequential BigInt replay") {
    val cust = Tables.load(spark, SharedSpark.sf001, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = Tables.load(spark, SharedSpark.sf001, "orders")
      .selectExpr("o_custkey", "o_orderpriority",
        "CAST(ROUND(o_totalprice * 100, 0) AS LONG)").collect()
      .map { r =>
        val t = if (Set("1", "2")(r.getString(1).take(1))) 1L else 0L
        (t, r.getLong(2), cust(r.getLong(0)))
      }
    val pb = base.groupBy(_._3).flatMap { case (bin, g) =>
      val st = g.map(_._1).sum; val nn = g.length
      if (st > 0 && st < nn) Some(bin -> st * 1000000L / nn) else None
    }
    val w = base.flatMap { case (t, y, bin) =>
      pb.get(bin).map { pp =>
        (t, BigInt(y),
          if (t == 1) BigInt(1000000000000L) / pp
          else BigInt(1000000000000L) / (1000000L - pp), pp)
      }
    }
    val nt = w.count(_._1 == 1L); val nc = w.count(_._1 == 0L)
    val syt = w.filter(_._1 == 1L).map(_._2).sum
    val syc = w.filter(_._1 == 0L).map(_._2).sum
    val swyt = w.filter(_._1 == 1L).map(x => x._2 * x._3).sum
    val swyc = w.filter(_._1 == 0L).map(x => x._2 * x._3).sum
    val swt = w.filter(_._1 == 1L).map(_._3).sum
    val swc = w.filter(_._1 == 0L).map(_._3).sum
    val got = graft.queries.Wave40.causalIpw
      .run(spark, SharedSpark.sf001).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == nt && r.getLong(1) == nc)
    assert(r.getLong(2) == pb.values.toSet.size)
    assert(r.getLong(3) == pb.values.min && r.getLong(4) == pb.values.max)
    assert(r.getLong(5) == (syt / nt - syc / nc).toLong)
    assert(r.getLong(6) == (swyt / swt - swyc / swc).toLong)
  }
}
