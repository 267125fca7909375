package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Wave69

/** Wave 69 invariants: Bradley-Terry MM axioms on hand-built match
  * matrices plus conservation/permutation checks on the real corpus
  * output, and an independent pure-Scala recompute of Cohen's kappa.
  */
class Wave69Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("bt: a symmetric 3-cycle converges to equal ratings") {
    // a beats b 5-5, b beats c 5-5, c beats a 5-5 — perfect symmetry
    val nij = Map(("a", "b") -> 10L, ("b", "a") -> 10L,
      ("b", "c") -> 10L, ("c", "b") -> 10L,
      ("a", "c") -> 10L, ("c", "a") -> 10L)
    val wins = Map("a" -> 10L, "b" -> 10L, "c" -> 10L)
    val g = Wave69.btFixedPoint(nij, wins, 8)
    assert(g("a") == g("b") && g("b") == g("c"), g.toString)
  }

  test("bt: a dominant player outranks, an all-loss player floors above 0") {
    // a beats b 9-1, a beats c 10-0, b beats c 7-3
    val nij = Map(("a", "b") -> 10L, ("b", "a") -> 10L,
      ("a", "c") -> 10L, ("c", "a") -> 10L,
      ("b", "c") -> 10L, ("c", "b") -> 10L)
    val wins = Map("a" -> 19L, "b" -> 8L, "c" -> 3L)
    val g = Wave69.btFixedPoint(nij, wins, 8)
    assert(g("a") > g("b") && g("b") > g("c"), g.toString)
    assert(g("c") >= 1, g.toString)
    // MM self-consistency at the fixed point: W_i ~ sum_j n_ij *
    // g_i/(g_i+g_j), within 5% after 8 rounds on this tiny graph
    val players = Seq("a", "b", "c")
    players.foreach { i =>
      val expected = players.filter(_ != i)
        .map(j => BigInt(nij((i, j))) * g(i) / (g(i) + g(j))).sum
      val w = BigInt(wins(i))
      // within 10% or one truncation unit at these tiny counts
      assert((expected - w).abs <= ((w + expected) / 10).max(1),
        s"$i: wins=$w expected=$expected g=$g")
    }
  }

  test("bt: all-loss opponents never zero a denominator (the clamp)") {
    val nij = Map(("a", "b") -> 2L, ("b", "a") -> 2L)
    val wins = Map("a" -> 2L) // b never wins
    val g = Wave69.btFixedPoint(nij, wins, 8)
    assert(g("b") >= 1 && g("a") > g("b"), g.toString)
  }

  test("q_eval_bradley_terry: wins conserve to matches/2, ranks are a " +
    "permutation consistent with (rating desc, brand)") {
    val rows = SparkEntry.queries("q_eval_bradley_terry")(
      spark, SharedSpark.sf001).collect()
    val nMatches = rows.map(_.getAs[Long]("n_matches")).sum
    val nWins = rows.map(_.getAs[Long]("n_wins")).sum
    // every match counts once per side in n_matches, once in one
    // winner's n_wins
    assert(nMatches == 2 * nWins, s"$nMatches vs $nWins")
    val byRank = rows.sortBy(_.getAs[Long]("rnk"))
    assert(byRank.map(_.getAs[Long]("rnk")).toSeq ==
      (1L to rows.length).toSeq)
    val key = byRank.map(r =>
      (-r.getAs[Long]("rating_fx"), r.getAs[String]("brand"))).toSeq
    assert(key == key.sorted, "rank order must follow (rating desc, brand)")
  }

  test("q_eval_kappa: matches an independent pure-Scala recompute and " +
    "stays <= 1e6") {
    val out = SparkEntry.queries("q_eval_kappa")(spark, SharedSpark.sf001)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n11"), r.getAs[Long]("n10"),
          r.getAs[Long]("n01"), r.getAs[Long]("n00"),
          Option(r.getAs[java.lang.Long]("kappa_ppm")).map(_.toLong)))
      .toMap
    // independent path: plain Scala tokenization + BigInt formula
    val docs = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = docs.groupBy(_._1).map { case (lang, xs) =>
      val abs = xs.map { case (_, text) =>
        val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
        val a = if (toks.length >= 56) 1 else 0
        val b = if (2 * toks.distinct.length >= toks.length) 1 else 0
        (a, b)
      }
      lang -> (xs.length.toLong,
        abs.count(_ == ((1, 1))).toLong, abs.count(_ == ((1, 0))).toLong,
        abs.count(_ == ((0, 1))).toLong, abs.count(_ == ((0, 0))).toLong)
    }
    assert(out.keySet == cells.keySet)
    cells.foreach { case (lang, (n, n11, n10, n01, n00)) =>
      val (on, o11, o10, o01, o00, okappa) = out(lang)
      assert((on, o11, o10, o01, o00) == ((n, n11, n10, n01, n00)), lang)
      val peNum = BigInt(n11 + n10) * (n11 + n01) +
        BigInt(n01 + n00) * (n10 + n00)
      val denom = BigInt(n) * n - peNum
      val expected =
        if (denom == 0) None
        else Some(((BigInt(n) * (n11 + n00) - peNum) * 1000000 / denom).toLong)
      assert(okappa == expected, s"$lang: $okappa vs $expected")
      okappa.foreach(k => assert(k <= 1000000L, lang))
    }
  }
}
