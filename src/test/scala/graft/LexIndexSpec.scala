package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The persisted lexical index ([[graft.text.LexIndex]]): serving from
  * disk equals an in-test recompute over the raw corpus, and the
  * posting scan prunes to the query terms' hash buckets at the file
  * level (the on-disk inverted-list property).
  */
class LexIndexSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("search from the persisted index equals a direct recompute and " +
    "prunes the posting scan to the query buckets") {
    val dir = java.nio.file.Files.createTempDirectory("lexindex").toString
    val docs = Tables.load(spark, SharedSpark.sf001, "documents")
    graft.text.LexIndex.writeIndex(docs, "doc_id", "text", dir)
    val terms = Map("dup" -> 40000L, "merge" -> 257L, "scan" -> 251L)
    val res = graft.text.LexIndex.search(spark, dir, terms, k = 10)
    val rows = res.collect()
    assert(rows.length == 10)
    assert(graft.text.LexIndex.prunes(res), "posting scan did not prune")

    // independent recompute from raw text
    val raw = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)))
    val dfCount = raw.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    def weights(ts: Array[String]): Map[String, Long] =
      ts.groupBy(identity).map { case (t, xs) =>
        t -> xs.length.toLong * (100000L / dfCount(t)) }
    val nq = terms.values.map(w => w * w).sum
    val expected = raw.map { case (id, ts) =>
      val w = weights(ts)
      val num = terms.map { case (t, wq) => wq * w.getOrElse(t, 0L) }.sum
      val n2 = w.values.map(x => x * x).sum
      (id, num, (BigInt(num) * num * 1000000000L / (BigInt(nq) * n2)).toLong)
    }.filter(_._2 != 0) // docs with no query term never join
      .sortBy { case (id, _, s) => (-s, id) }.take(10)
    val got = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected.toSeq, s"got=$got\nexp=${expected.toSeq}")
  }
}
