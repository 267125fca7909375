package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent recompute for Wave 68 (q_text_dupgram_coverage). */
class Wave68Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_text_dupgram_coverage equals a per-position recompute from " +
    "raw text (within-doc repeats alone never count; coverage is " +
    "exact ppm)") {
    val docs = Tables.load(spark, SharedSpark.sf001, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams(text: String): Seq[String] = {
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      (0 to toks.length - 8).map(i => toks.slice(i, i + 8).mkString(" "))
    }
    val pos = docs.flatMap { case (id, t) => grams(t).map(g => (id, g)) }
    val dupSet = pos.map { case (id, g) => (g, id) }.distinct
      .groupBy(_._1).collect { case (g, xs) if xs.length >= 2 => g }.toSet
    val expect = pos.groupBy(_._1).map { case (id, xs) =>
      val nPos = xs.length.toLong
      val nDup = xs.count(x => dupSet(x._2)).toLong
      id -> (nPos, nDup, nDup * 1000000L / nPos)
    }
    val got = SparkEntry.queries("q_text_dupgram_coverage")(
      spark, SharedSpark.sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect, s"coverage drift: got ${got.size} docs, " +
      s"expect ${expect.size}; sample diff: " +
      s"${(expect.toSet -- got.toSet).take(3)}")
    // the corpus's planted duplicates make the audit non-vacuous
    assert(got.values.exists(_._2 > 0), "some doc must carry dup grams")
    assert(got.values.exists(_._2 == 0), "some doc must be clean")
  }
}
