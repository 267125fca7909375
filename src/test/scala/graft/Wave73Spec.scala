package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 73 invariants: rich-club coefficients recomputed from the raw
  * parquet in plain Scala (graph build included), and the SRM test
  * recomputed with an independent MD5 path.
  */
class Wave73Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_graph_richclub matches a pure-Scala recompute with monotone " +
    "N_k / E_k") {
    val li = spark.read
      .parquet(s"${SharedSpark.sf001}/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    // .toSeq BEFORE collect: Map.collect with a pair result re-keys by
    // p._1 and silently dedups (the CLAUDE.md spec-recompute trap —
    // hit here too: 97 "pairs" instead of 2324)
    val pairCnt = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val parts = xs.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).toSeq.collect { case (p, xs) if xs.size >= 2 => p }
    val deg = (pairCnt.map(_._1) ++ pairCnt.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    val ks = Seq(1L, 2L, 4L, 8L, 16L, 32L)
    val expected = ks.map { k =>
      val nK = deg.values.count(_ > k).toLong
      val eK = pairCnt.count { case (u, v) => deg(u) > k && deg(v) > k }
        .toLong
      k -> (nK, eK,
        if (nK >= 2) Some(2 * eK * 1000000L / (nK * (nK - 1))) else None)
    }.toMap
    val out = SparkEntry.queries("q_graph_richclub")(
      spark, SharedSpark.sf001).collect()
    assert(out.length == ks.size)
    out.foreach { r =>
      val k = r.getAs[Long]("k")
      val (nK, eK, phi) = expected(k)
      assert(r.getAs[Long]("n_k") == nK, s"k=$k")
      assert(r.getAs[Long]("e_k") == eK, s"k=$k")
      assert(Option(r.getAs[java.lang.Long]("phi_ppm")).map(_.toLong)
        == phi, s"k=$k")
    }
    // monotone thresholds: subgraphs shrink as k grows
    val byK = ks.map(expected)
    assert(byK.map(_._1) == byK.map(_._1).sorted.reverse)
    assert(byK.map(_._2) == byK.map(_._2).sorted.reverse)
  }

  test("q_ab_srm matches an independent MD5 recompute and flags per the " +
    "3.841 critical value") {
    def inA(uid: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(uid.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      hex < "80"
    }
    val ev = spark.read
      .parquet(s"${SharedSpark.sf001}/events.parquet")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).distinct
    val expected = ev.groupBy(_._1).map { case (t, xs) =>
      val users = xs.map(_._2).distinct
      val nA = users.count(inA).toLong
      val nB = users.length - nA
      val chi2 = (BigInt(nA - nB) * (nA - nB) * 1000000 / (nA + nB)).toLong
      t -> (nA, nB, chi2)
    }
    val out = SparkEntry.queries("q_ab_srm")(spark, SharedSpark.sf001)
      .collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (nA, nB, chi2) = expected(t)
      assert(r.getAs[Long]("n_a") == nA, t)
      assert(r.getAs[Long]("n_b") == nB, t)
      assert(r.getAs[Long]("chi2_micro") == chi2, t)
      assert(r.getAs[Long]("srm_flag") == (if (chi2 > 3841459L) 1L else 0L), t)
    }
  }
}
