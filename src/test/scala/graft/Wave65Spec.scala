package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent recompute for Wave 65 (q_dedup_prefixfilter). */
class Wave65Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def shingles(text: String): Set[String] = {
    val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
    if (toks.length < 3) Set.empty
    else (0 to toks.length - 3)
      .map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
  }

  /** Pure-Scala replica of the engine's candidate logic: global order
    * (df asc, shingle asc), per-set prefix n - ceil(n/2) + 1,
    * candidate iff the prefixes share an element. */
  private def prefixCandidates(
      sets: Map[Long, Set[String]]): Set[(Long, Long)] = {
    val df = sets.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity).map { case (s, xs) => s -> xs.size }
    val prefix = sets.map { case (id, shs) =>
      val ordered = shs.toSeq.sortBy(s => (df(s), s))
      val n = ordered.size
      id -> ordered.take(n - (n + 1) / 2 + 1).toSet
    }
    val ids = sets.keys.toSeq.sorted
    (for {
      a <- ids; b <- ids if a < b
      if prefix(a).exists(prefix(b))
    } yield (a, b)).toSet
  }

  test("q_dedup_prefixfilter equals the brute-force J>=1/2 pair set " +
    "(completeness: the prefix filter loses no qualifying pair; " +
    "soundness: verification admits no non-qualifying one)") {
    val docs = Tables.load(spark, SharedSpark.sf001, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(r.getString(1)))
      .filter(_._2.nonEmpty).toMap
    val ids = docs.keys.toSeq.sorted
    val expect = (for {
      a <- ids; b <- ids if a < b
      common = (docs(a) & docs(b)).size
      na = docs(a).size; nb = docs(b).size
      if 2L * common >= (na + nb - common)
    } yield (a, b, common.toLong, na.toLong, nb.toLong,
      common * 1000000L / (na + nb - common),
      common * 1000000L / math.min(na, nb))).toSet
    val got = SparkEntry.queries("q_dedup_prefixfilter")(
      spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expect,
      s"engine ${got.size} pairs vs brute force ${expect.size}; " +
        s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
    assert(expect.nonEmpty, "the corpus must contain planted near-dups " +
      "for this gate to be meaningful")
  }

  test("prefix-filter completeness holds on adversarial synthetic sets " +
    "(common elements forced late in the global order)") {
    // deterministic LCG — no Math.random (replayable)
    var seed = 0x9E3779B97F4A7C15L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val universe = (0 until 40).map(i => f"s$i%02d")
    for (trial <- 0 until 200) {
      val sets = (0L until 8L).map { id =>
        val n = 2 + next(10)
        id -> Iterator.continually(universe(next(universe.size)))
          .take(n * 3).toSeq.distinct.take(n).toSet
      }.toMap.filter(_._2.nonEmpty)
      val cands = prefixCandidates(sets)
      val ids = sets.keys.toSeq.sorted
      for {
        a <- ids; b <- ids if a < b
        common = (sets(a) & sets(b)).size
        if 2L * common >= (sets(a).size + sets(b).size - common)
      } assert(cands.contains((a, b)),
        s"trial $trial: qualifying pair ($a,$b) missed by the prefix " +
          s"filter — sets ${sets(a)} / ${sets(b)}")
    }
  }
}
