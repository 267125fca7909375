package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 76 invariants: duplication inflation recomputed from raw
  * parquet with an independent keep-first pass, plus the accounting
  * axioms (global dup count matches q_dedup_exact's contract; shares
  * bounded; inflation >= 1e6).
  */
class Wave76Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_curation_dup_inflation matches an independent keep-first " +
    "recompute and keeps its accounting axioms") {
    val docs = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("doc_id", "source", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Number](2).longValue, r.getString(3)))
    val keep = docs.groupBy(_._4).values
      .map(xs => xs.minBy(_._1)._1).toSet
    val expected = docs.groupBy(_._2).map { case (src, xs) =>
      val dup = xs.filterNot(x => keep(x._1))
      src -> (xs.length.toLong, dup.length.toLong,
        xs.map(_._3).sum, dup.map(_._3).sum)
    }
    val out = SparkEntry.queries("q_curation_dup_inflation")(
      spark, SharedSpark.sf001).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val (nDocs, nDup, chars, dupChars) = expected(src)
      assert(r.getAs[Long]("n_docs") == nDocs, src)
      assert(r.getAs[Long]("n_dup_docs") == nDup, src)
      assert(r.getAs[Long]("chars") == chars, src)
      assert(r.getAs[Long]("dup_chars") == dupChars, src)
      val share = r.getAs[Long]("dup_share_ppm")
      assert(share == dupChars * 1000000 / chars && share <= 1000000L, src)
      Option(r.getAs[java.lang.Long]("inflation_ppm")).foreach { infl =>
        assert(infl >= 1000000L, src)
        assert(infl == chars * 1000000 / (chars - dupChars), src)
      }
    }
    // corpus-wide: dup docs = docs minus distinct texts (keep-first)
    assert(out.map(_.getAs[Long]("n_dup_docs")).sum ==
      docs.length - keep.size)
  }
}
