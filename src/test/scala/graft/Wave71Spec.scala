package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 71 invariants: Burrows' Delta and containment recomputed
  * end-to-end in plain Scala from the raw parquet (exhaustively for
  * containment — every qualifying pair must appear, none extra).
  */
class Wave71Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def toks(t: String): Array[String] =
    t.toLowerCase.split(" ").filter(_.nonEmpty)

  test("q_text_burrows_delta matches a pure-Scala recompute") {
    val panel = Seq("the", "a", "scan", "column", "window", "order",
      "sort", "part", "agg", "value", "key", "join")
    val docs = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1)
    val fPpm: Map[(String, String), Long] = bySrc.toSeq.flatMap {
      case (src, xs) =>
        val all = xs.flatMap(x => toks(x._2))
        val n = all.length.toLong
        panel.map(w => (src, w) -> all.count(_ == w) * 1000000L / n)
    }.toMap
    val sources = bySrc.keys.toSeq.sorted
    val nSrc = sources.length.toLong
    val z: Map[(String, String), Long] = panel.flatMap { w =>
      val fs = sources.map(srcv => fPpm((srcv, w)))
      val s = fs.sum; val s2 = fs.map(v => v * v).sum
      val sigma = math.sqrt(((nSrc * s2 - s * s) / (nSrc * nSrc)).toDouble)
        .floor.toLong
      sources.map(src => (src, w) ->
        (if (sigma > 0) (fPpm((src, w)) * nSrc - s) * 1000 / (sigma * nSrc)
         else 0L))
    }.toMap
    val expected = (for {
      a <- sources; b <- sources if a < b
    } yield (a, b) ->
      panel.map(w => math.abs(z((a, w)) - z((b, w)))).sum / panel.size).toMap
    val out = SparkEntry.queries("q_text_burrows_delta")(
      spark, SharedSpark.sf001).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val k = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(r.getAs[Long]("delta_milli") == expected(k), k.toString)
    }
  }

  test("q_dedup_containment matches an exhaustive pure-Scala recompute " +
    "(every qualifying pair, none extra) and keeps its axioms") {
    val docs = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val t = toks(r.getString(1))
        r.getLong(0) -> (if (t.length < 3) Set.empty[String]
                         else t.sliding(3).map(_.mkString(" ")).toSet)
      }.sortBy(_._1)
    // df cap mirrors the engine's candidate discipline (vacuous at
    // this SF, but applied for fidelity)
    val df = docs.flatMap(_._2).groupBy(identity).map { case (g, xs) =>
      g -> xs.size
    }
    val capped = docs.map { case (id, sh) =>
      id -> sh.filter(g => df(g) <= 50)
    }.toMap
    val expected = (for {
      (ida, sa) <- docs; (idb, sb) <- docs if ida < idb
      common = (capped(ida) intersect capped(idb)).size.toLong
      if common > 0 && sa.nonEmpty && sb.nonEmpty
      ca = common * 1000000L / sa.size
      cb = common * 1000000L / sb.size
      if math.max(ca, cb) >= 500000L
    } yield (ida, idb) -> (common, sa.size.toLong, sb.size.toLong, ca, cb))
      .toMap
    val out = SparkEntry.queries("q_dedup_containment")(
      spark, SharedSpark.sf001).collect()
    assert(out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet == expected.keySet, "pair set must match exhaustive recompute")
    out.foreach { r =>
      val k = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val (common, na, nb, ca, cb) = expected(k)
      assert(r.getAs[Long]("common") == common, k.toString)
      assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb, k)
      assert(r.getAs[Long]("cont_a_ppm") == ca, k.toString)
      assert(r.getAs[Long]("cont_b_ppm") == cb, k.toString)
      // axioms: containment bounded by 1e6, common bounded by set sizes
      assert(ca <= 1000000L && cb <= 1000000L, k.toString)
      assert(common <= math.min(na, nb), k.toString)
      assert(r.getAs[Long]("near_subset") ==
        (if (math.max(ca, cb) >= 900000L) 1L else 0L), k.toString)
    }
  }
}
