package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Bm25

/** BM25 has no cross-engine oracle (ln is not libm-bit-stable), so the
  * operator is checked against an independent plain-Scala computation
  * plus the ranking properties the formula must exhibit.
  */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val k1 = 1.2
  private val b = 0.75

  /** Reference implementation: naive loops, no Spark. */
  private def bm25Ref(
      corpus: Seq[(Long, String)],
      terms: Seq[String]): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.length).sum / n
    val dfm = terms.map(t => t -> toks.values.count(_.contains(t)).toDouble).toMap
    toks.map { case (id, tk) =>
      val dl = tk.length.toDouble
      id -> terms.map { t =>
        val tf = tk.count(_ == t).toDouble
        if (tf == 0 || dfm(t) == 0) 0.0
        else math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
          tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
      }.sum
    }
  }

  test("scores match the independent reference on a hand-built corpus") {
    val corpus = Seq(
      (1L, "spark shuffle join join join scan"),
      (2L, "spark scan filter sort window agg batch stream merge col"),
      (3L, "join merge window"),
      (4L, "filter sort batch"),
      (5L, "join spark " + Seq.fill(50)("pad").mkString(" ")))
    val terms = Seq("join", "spark", "window")
    val got = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      terms, k = 10, k1, b)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = bm25Ref(corpus, terms).filter(_._2 > 0)
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - ref(id)) < 1e-9, s"doc $id: got $s want ${ref(id)}")
    }
  }

  test("ranking properties: tf monotone, length-normalized, idf-discriminating") {
    // same length, more hits of the query term wins
    val c1 = Seq(
      (1L, "join join join pad pad pad"),
      (2L, "join pad pad pad pad pad"))
    val r1 = Bm25.topK(c1.toDF("doc_id", "text"), "doc_id", "text",
      Seq("join"), 2).collect()
    assert(r1.head.getLong(0) == 1L)
    // same tf, shorter doc wins (length normalization)
    val c2 = Seq(
      (1L, "join pad pad"),
      (2L, "join " + Seq.fill(30)("pad").mkString(" ")))
    val r2 = Bm25.topK(c2.toDF("doc_id", "text"), "doc_id", "text",
      Seq("join"), 2).collect()
    assert(r2.head.getLong(0) == 1L)
    // a rare term outweighs a common one at equal tf/dl
    val c3 = Seq(
      (1L, "rare pad"), (2L, "common pad"), (3L, "common x"),
      (4L, "common y"), (5L, "common z"))
    val r3 = Bm25.topK(c3.toDF("doc_id", "text"), "doc_id", "text",
      Seq("rare", "common"), 5).collect()
    assert(r3.head.getLong(0) == 1L)
  }

  test("full sf0.01 table: top-k ids AND scores match the independent " +
    "reference end-to-end") {
    // the registry query's exact shape (same terms / k1 / b) over the
    // full 500-doc table, checked against the naive no-Spark
    // reference — not the hand-built fixture
    val corpus = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val terms = Seq("dup", "merge", "window", "scan")
    val k = 50
    val got = Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text",
      terms, k, k1, b).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val refTop = bm25Ref(corpus, terms).filter(_._2 > 0).toSeq
      .sortBy { case (id, s) => (-s, id) }.take(k)
    assert(got.length == refTop.length)
    got.zip(refTop).foreach { case ((gid, gs), (rid, rs)) =>
      assert(gid == rid, s"rank order diverged: got doc $gid, want $rid")
      assert(math.abs(gs - rs) < 1e-9, s"doc $gid: got $gs want $rs")
    }
    // and the REGISTRY entry end-to-end at sf0.01 (its own k=20 cut):
    // the no-oracle query gets the same independent full-table check
    // the oracle-backed entries get from DuckDB
    val reg = graft.queries.TextQueries.bm25TopK
      .run(spark, SharedSpark.sf01).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val refReg = refTop.take(20)
    assert(reg.length == refReg.length)
    reg.zip(refReg).foreach { case ((gid, gs), (rid, rs)) =>
      assert(gid == rid, s"registry rank diverged: got doc $gid, want $rid")
      assert(math.abs(gs - rs) < 1e-9, s"doc $gid: got $gs want $rs")
    }
  }

  test("corpus query returns k rows sorted by score desc with id tiebreak") {
    val out = graft.queries.TextQueries.bm25TopK
      .run(spark, SharedSpark.sf001).collect()
    assert(out.length == 20)
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted(Ordering[Double].reverse))
    // "dup" (df=25 of 500) is the discriminator: every top doc hits it
    val topIds = out.map(_.getLong(0)).toSet
    val dupDocs = Tables.load(spark, SharedSpark.sf001, "documents")
      .collect().filter(_.getString(1).toLowerCase.split(" ").contains("dup"))
      .map(_.getLong(0)).toSet
    assert(topIds.subsetOf(dupDocs))
  }

  /** Independent integer reference for [[Bm25.topKFx]]'s formula —
    * plain loops, no Spark, sharing only [[graft.plans.FxLog2]]. */
  private def bm25FxRef(
      corpus: Seq[(Long, String)],
      terms: Seq[String]): Map[Long, Long] = {
    import graft.plans.FxLog2.fxlog2
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    val n = toks.size.toLong
    val sumDl = toks.values.map(_.length.toLong).sum
    val dfm = terms.map(t =>
      t -> toks.values.count(_.contains(t)).toLong).toMap
    toks.flatMap { case (id, tk) =>
      val dl = tk.length.toLong
      val ws = terms.flatMap { t =>
        val tf = tk.count(_ == t).toLong
        if (tf == 0L || dfm(t) == 0L) None
        else {
          val idf2 = fxlog2(2L * n + 2L) - fxlog2(2L * dfm(t) + 1L)
          val dlr20 = dl * n * 1048576L / sumDl
          val tfnorm20 = 22L * tf * 1099511627776L /
            ((10L * tf + 3L) * 1048576L + 9L * dlr20)
          Some(idf2 * tfnorm20 / 1048576L)
        }
      }
      if (ws.isEmpty) None else Some(id -> ws.sum)
    }
  }

  test("fx scores match the independent integer reference EXACTLY " +
    "and agree with the double scores to fx precision") {
    val corpus = Seq(
      (1L, "spark shuffle join join join scan"),
      (2L, "spark scan filter sort window agg batch stream merge col"),
      (3L, "join merge window"),
      (4L, "filter sort batch"),
      (5L, "join spark " + Seq.fill(50)("pad").mkString(" ")))
    val terms = Seq("join", "spark", "window")
    val got = Bm25.topKFx(corpus.toDF("doc_id", "text"), "doc_id", "text",
      terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = bm25FxRef(corpus, terms)
    assert(got == ref)
    // fx scores are log2-units: score_fx / 2^30 ≈ score_ln / ln 2
    val dbl = bm25Ref(corpus, terms).filter(_._2 > 0)
    got.foreach { case (id, fx) =>
      val want = dbl(id) / math.log(2.0)
      assert(math.abs(fx / math.pow(2.0, 30) - want) < 1e-3,
        s"doc $id: fx ${fx / math.pow(2.0, 30)} vs double $want")
    }
  }

  test("fx corpus query ranks like the double-precision query at " +
    "sf0.001 (same top-20 id set)") {
    val fxIds = graft.queries.TextQueries.bm25Fx
      .run(spark, SharedSpark.sf001).collect().map(_.getLong(0)).toSet
    val dblIds = graft.queries.TextQueries.bm25TopK
      .run(spark, SharedSpark.sf001).collect().map(_.getLong(0)).toSet
    assert(fxIds == dblIds)
  }
}
