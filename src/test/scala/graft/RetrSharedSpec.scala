package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** r15: pins the compiled dense-vector fold in
  * [[graft.queries.RetrievalShared.docvecs]] to the HOF formulation it
  * replaced — map_from_entries(collect_list(struct(idx, w))) probed by
  * transform(sequence(0, n-1), i -> coalesce(element_at(mw, i), 0)).
  * Exercises the contract cases: dense rows (every idx present),
  * sparse rows (gaps stay 0), a single-entry row, and idx at both
  * boundaries 0 and n-1.
  */
class RetrSharedSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("denseFoldUdf equals the map_from_entries + transform fold") {
    import spark.implicits._
    val n = 7
    val rnd = new scala.util.Random(42)
    val rows: Seq[(Long, Seq[(Int, Long)])] =
      (0L until 50L).map { doc =>
        val k = 1 + rnd.nextInt(n)
        val idxs = rnd.shuffle((0 until n).toList).take(k)
        doc -> idxs.map(i => i -> (1L + rnd.nextInt(100000).toLong))
      } ++ Seq(
        50L -> (0 until n).map(i => i -> (i * 1000L + 1L)), // dense
        51L -> Seq(0 -> 5L),                                // lone idx 0
        52L -> Seq((n - 1) -> 9L))                          // lone idx n-1
    val df = rows.toDF("doc_id", "pairs")
      .select(col("doc_id"),
        expr("transform(pairs, p -> struct(p._1 AS idx, p._2 AS w))")
          .as("iw"))
    val hof = df.select(col("doc_id"),
      expr(s"""transform(sequence(0, ${n - 1}), i ->
              |  coalesce(element_at(map_from_entries(iw), i), 0L))"""
        .stripMargin).as("v"))
    val udfed = df.select(col("doc_id"),
      graft.queries.RetrievalShared.denseFoldUdf(n)(col("iw")).as("v"))
    val a = hof.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1)))
    val b = udfed.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getSeq[Long](1)))
    assert(a.length == b.length && a.length == rows.length)
    a.zip(b).foreach { case ((da, va), (db, vb)) =>
      assert(da == db)
      assert(va == vb, s"doc $da: $va vs $vb")
      assert(va.length == n)
    }
  }
}
