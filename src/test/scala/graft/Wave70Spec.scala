package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.FxLog2

/** Wave 70 invariants: BLEU/ROUGE recomputed end-to-end in plain
  * Scala (tokenize -> lang-adjacent pairs -> multiset clip counts ->
  * the exact formulas) against the engine output, plus the
  * self-identity axioms of both metrics.
  */
class Wave70Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private case class PairStat(cid: Long, rid: Long, cLen: Long, rLen: Long,
      clip1: Long, clip2: Long)

  private def grams(toks: Array[String], n: Int): Map[String, Long] =
    if (toks.length < n) Map.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq
      .groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }

  private def clip(c: Map[String, Long], r: Map[String, Long]): Long =
    c.iterator.map { case (g, cc) => math.min(cc, r.getOrElse(g, 0L)) }.sum

  private lazy val recomputed: Map[Long, PairStat] = {
    val docs = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    docs.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(_._1)
      sorted.zip(sorted.tail).map { case ((cid, _, ct), (rid, _, rt)) =>
        val c = ct.toLowerCase.split(" ").filter(_.nonEmpty)
        val r = rt.toLowerCase.split(" ").filter(_.nonEmpty)
        PairStat(cid, rid, c.length.toLong, r.length.toLong,
          clip(grams(c, 1), grams(r, 1)), clip(grams(c, 2), grams(r, 2)))
      }
    }.map(p => p.cid -> p).toMap
  }

  test("q_eval_rouge matches the pure-Scala recompute exactly") {
    val out = SparkEntry.queries("q_eval_rouge")(spark, SharedSpark.sf001)
      .collect()
    assert(out.length == recomputed.size)
    out.foreach { r =>
      val p = recomputed(r.getAs[Long]("cand_id"))
      assert(r.getAs[Long]("ref_id") == p.rid)
      assert(r.getAs[Long]("clip1") == p.clip1, p.toString)
      assert(r.getAs[Long]("clip2") == p.clip2, p.toString)
      assert(r.getAs[Long]("rouge1_recall_ppm") == p.clip1 * 1000000 / p.rLen)
      assert(r.getAs[Long]("rouge1_f1_ppm") ==
        2 * p.clip1 * 1000000 / (p.cLen + p.rLen))
    }
  }

  test("q_eval_bleu matches the pure-Scala recompute (fxlog2 kernel)") {
    val invLn2E9 = 1442695041L
    val out = SparkEntry.queries("q_eval_bleu")(spark, SharedSpark.sf001)
      .collect()
    assert(out.length == recomputed.size)
    var nonNull = 0
    out.foreach { r =>
      val p = recomputed(r.getAs[Long]("cand_id"))
      assert(r.getAs[Long]("c_len") == p.cLen && r.getAs[Long]("r_len") == p.rLen)
      val got = Option(r.getAs[java.lang.Long]("log2_bleu_fx")).map(_.toLong)
      val expected =
        if (p.clip1 > 0 && p.clip2 > 0) {
          val prec = (FxLog2.fxlog2(p.clip1) - FxLog2.fxlog2(p.cLen) +
            FxLog2.fxlog2(p.clip2) - FxLog2.fxlog2(p.cLen - 1)) / 2
          val bp =
            if (p.cLen >= p.rLen) BigInt(0)
            else BigInt(p.cLen - p.rLen) * invLn2E9 * 1073741824L /
              (BigInt(p.cLen) * 1000000000L)
          Some((prec + bp.toLong))
        } else None
      assert(got == expected, s"${p.cid}: $got vs $expected ($p)")
      if (got.nonEmpty) nonNull += 1
    }
    // the adjacent-pair workload must exercise the metric (some pairs
    // overlap in bigrams, some do not)
    assert(nonNull > 0 && nonNull <= out.length)
  }

  test("self-identity axioms: a doc against itself scores perfectly") {
    val toks = "a b c a b".split(" ")
    val g1 = grams(toks, 1); val g2 = grams(toks, 2)
    assert(clip(g1, g1) == toks.length)
    assert(clip(g2, g2) == toks.length - 1)
    // ROUGE-1 recall and F1 both 1e6 exactly on self-pairs
    assert(clip(g1, g1) * 1000000 / toks.length == 1000000L)
    assert(2 * clip(g1, g1) * 1000000 / (2L * toks.length) == 1000000L)
    // log2 BLEU of a self-pair is 0 (perfect precision, BP = 1)
    val fx = (FxLog2.fxlog2(5) - FxLog2.fxlog2(5) +
      FxLog2.fxlog2(4) - FxLog2.fxlog2(4)) / 2
    assert(fx == 0L)
  }
}
