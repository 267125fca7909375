package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Wave 18 invariants: TextRank chunk ranking against a sequential
  * weighted-PageRank recompute, and the incremental-aggregate
  * merge ≡ rebuild contract.
  */
class Wave18Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_textrank_chunks equals a sequential weighted-PageRank replay") {
    val docs = Tables.load(spark, SharedSpark.sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
    val want = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" ").filter(_.nonEmpty)
      val nCh = math.max((toks.length + 7) / 8, 1)
      val chunks = (0 until nCh).filter(_ * 8 < toks.length).map { g =>
        g.toLong -> toks.slice(g * 8, g * 8 + 8)
      }
      val tokSets = chunks.map { case (g, ws) => g -> ws.toSet }.toMap
      val edges = (for {
        (ci, sa) <- tokSets.toSeq; (cj, sb) <- tokSets.toSeq
        if ci < cj
        w = (sa & sb).size.toLong if w >= 2
      } yield (ci, cj, w)).flatMap(e =>
        Seq((e._1, e._2, e._3), (e._2, e._1, e._3)))
      val wdeg = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(_._3).sum
      }
      var pr: Map[Long, Long] = chunks.map(_._1 -> 1000000L).toMap
      (1 to 4).foreach { _ =>
        val fl = edges.groupBy(_._2).map { case (cj, es) =>
          cj -> es.map(e => pr(e._1) * e._3 / wdeg(e._1)).sum
        }
        pr = chunks.map { case (g, _) =>
          g -> (150000L + 85L * fl.getOrElse(g, 0L) / 100L)
        }.toMap
      }
      val top = chunks.map { case (g, ws) => (g, pr(g), ws.mkString(" ")) }
        .sortBy { case (g, p, _) => (-p, g) }.take(2)
      top.zipWithIndex.map { case ((g, p, txt), i) =>
        (id, (i + 1).toLong, g, p,
          java.security.MessageDigest.getInstance("MD5")
            .digest(txt.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = graft.queries.Wave18.textrankChunks
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == want)
  }

  test("q_incremental_agg: merge_ok everywhere and the merged stats " +
    "recompute from raw rows") {
    val rows = graft.queries.Wave18.incrementalAgg
      .run(spark, SharedSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(9)))
    assert(rows.nonEmpty && rows.forall(_._6 == 1L),
      "merge must equal rebuild for every customer")
    val raw = Tables.load(spark, SharedSpark.sf001, "orders")
      .select("o_custkey", "o_totalprice", "o_orderdate").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100),
        r.getTimestamp(2).getTime / 86400000L))
      .groupBy(_._1)
    rows.foreach { case (ck, n, s, mn, mx, _) =>
      val g = raw(ck)
      assert(n == g.length && s == g.map(_._2).sum)
      assert(mn == g.map(_._3).min && mx == g.map(_._3).max)
    }
  }
}
