package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 77 invariants: Krippendorff's alpha recomputed end-to-end in
  * plain Scala (independent tokenizer + exact BigInt rational), with
  * its textbook axioms; the preference-cycle audit recomputed from an
  * independent pair walk, plus the structural triad identities.
  */
class Wave77Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** Exact alpha_ppm for (n, t1, S) with m = 3 raters, binary, as the
    * query defines it: (6nT − S·N(N−1))·1e6 quot (6nT), N = 3n. */
  private def alphaPpm(n: Long, t1: Long, sd: Long): Option[Long] = {
    val bigN = BigInt(3) * n
    val t0 = bigN - t1
    val t = bigN * bigN - BigInt(t1) * t1 - t0 * t0
    val den = BigInt(6) * n * t
    if (den == 0) None
    else Some(((den - BigInt(sd) * bigN * (bigN - 1)) * 1000000 / den).toLong)
  }

  test("q_eval_krippendorff matches a pure-Scala recompute per language") {
    val docs = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("lang", "text").collect()
      .map { r =>
        val text = r.getString(1)
        val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
        val s = (if (toks.length >= 56) 1 else 0) +
          (if (2 * toks.distinct.length >= toks.length) 1 else 0) +
          (if (text.length <= 400) 1 else 0)
        (r.getString(0), s.toLong)
      }
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      val n = xs.length.toLong
      val t1 = xs.map(_._2).sum
      val sd = xs.map(x => 9 - x._2 * x._2 - (3 - x._2) * (3 - x._2)).sum
      lang -> (n, t1, sd, alphaPpm(n, t1, sd))
    }
    val out = SparkEntry.queries("q_eval_krippendorff")(spark, SharedSpark.sf001)
      .collect()
    assert(out.map(_.getString(0)).toSet == expected.keySet)
    out.foreach { r =>
      val (n, t1, sd, a) = expected(r.getString(0))
      assert(r.getAs[Long]("n") == n, r.getString(0))
      assert(r.getAs[Long]("t1") == t1, r.getString(0))
      assert(r.getAs[Long]("s_disag") == sd, r.getString(0))
      assert(Option(r.getAs[java.lang.Long]("alpha_ppm")).map(_.toLong) == a,
        r.getString(0))
    }
  }

  test("alpha axioms: perfect agreement -> 1e6; independent-margin " +
    "disagreement -> ~0; all-same-category -> undefined (NULL)") {
    // perfect agreement: every unit rated (1,1,1) or (0,0,0) -> S = 0
    assert(alphaPpm(n = 10, t1 = 15, sd = 0).contains(1000000L))
    // worst case at balanced margins: every unit split 2-1 (sd = 4n)
    // drives alpha negative (systematic disagreement), never above 0
    val worst = alphaPpm(n = 10, t1 = 15, sd = 40).get
    assert(worst < 0, s"expected negative alpha, got $worst")
    // degenerate: all 3n ratings the same category -> T = 0 -> NULL
    assert(alphaPpm(n = 10, t1 = 0, sd = 0).isEmpty)
  }

  test("q_pref_cycles matches an independent recompute and its " +
    "structural identities hold") {
    import org.apache.spark.sql.functions._
    val s = spark
    val d = SharedSpark.sf001
    // independent pair walk (plain Scala off the raw tables)
    val li = s.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val brandOf = s.read.parquet(s"$d/part.parquet")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // Spark's round(double, 0) is BigDecimal.valueOf(x).setScale(0,
    // HALF_UP) — replicate it exactly
    def rnd(x: Double): Long = java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact
    val spend = new scala.collection.mutable.HashMap[(Long, String), BigInt]()
    li.foreach { case (ok, pk, price, disc) =>
      val micro = BigInt(rnd(price * 100)) * (10000L - rnd(disc * 10000))
      val k = (ok, brandOf(pk))
      spend(k) = spend.getOrElse(k, BigInt(0)) + micro
    }
    val wins = new scala.collection.mutable.HashMap[(String, String), Long]()
    spend.keys.groupBy(_._1).foreach { case (ok, ks) =>
      val bs = ks.map(_._2).toSeq.sorted
      for (i <- bs.indices; j <- (i + 1) until bs.length) {
        val (bi, bj) = (bs(i), bs(j))
        val w = if (spend((ok, bi)) >= spend((ok, bj))) (bi, bj) else (bj, bi)
        wins(w) = wins.getOrElse(w, 0L) + 1
      }
    }
    // majority edges (ties -> lex smaller) over unordered pairs
    val pairsU = wins.keysIterator
      .map { case (x, y) => if (x < y) (x, y) else (y, x) }.toSeq.distinct
    val edge = pairsU.map { case (i, j) =>
      val wi = wins.getOrElse((i, j), 0L)
      val wj = wins.getOrElse((j, i), 0L)
      (i, j) -> (if (wi >= wj) (i, j) else (j, i))
    }.toMap
    val pairSet = pairsU.toSet
    val triads = pairsU.flatMap { case (a, b) =>
      pairsU.collect { case (`b`, c) if pairSet((a, c)) => (a, b, c) }
    }
    val cyclic = triads.count { case (a, b, c) =>
      val e1 = edge((a, b)); val e2 = edge((b, c)); val e3 = edge((a, c))
      (e1 == (a, b) && e2 == (b, c) && e3 == (c, a)) ||
        (e1 == (b, a) && e2 == (c, b) && e3 == (a, c))
    }
    val row = SparkEntry.queries("q_pref_cycles")(s, d).collect().head
    assert(row.getAs[Long]("n_pairs") == pairsU.length)
    assert(row.getAs[Long]("n_triads") == triads.length)
    assert(row.getAs[Long]("n_cyclic") == cyclic)
    if (triads.nonEmpty)
      assert(row.getAs[Long]("cyc_ppm") == cyclic * 1000000L / triads.length)
    // structure: a complete tournament on n brands has C(n,3) triads,
    // so observed triads can never exceed that bound
    val nb = row.getAs[Long]("n_brands")
    assert(row.getAs[Long]("n_triads") <= nb * (nb - 1) * (nb - 2) / 6)
  }
}
