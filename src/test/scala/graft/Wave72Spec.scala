package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.FxLog2
import graft.queries.RetrievalShared

/** Wave 72 invariants: MRR recomputed from the shared rankings with
  * independent Scala logic, and per-source KL recomputed end-to-end
  * in plain Scala with the fxlog2 kernel + the Gibbs bound.
  */
class Wave72Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_eval_mrr matches an independent first-hit scan of the shared " +
    "rankings, and rr values live on the exact 1e6/rank lattice") {
    val s10 = RetrievalShared.sparseTop20(spark, SharedSpark.sf001)
      .filter("rs <= 10").collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("doc_id"),
        r.getAs[Number]("rs").longValue))
    val rel = RetrievalShared.denseTop20(spark, SharedSpark.sf001)
      .filter("rd <= 10").collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id"))).toSet
    val expected = s10.groupBy(_._1).map { case (p, xs) =>
      val firstRel = xs.filter(x => rel.contains((p, x._2))).map(_._3)
        .sorted.headOption
      p -> firstRel
    }
    val out = SparkEntry.queries("q_eval_mrr")(spark, SharedSpark.sf001)
      .collect()
    assert(out.length == expected.size)
    val lattice = (1L to 10L).map(1000000L / _).toSet + 0L
    out.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val got = Option(r.getAs[java.lang.Long]("first_rel_rank"))
        .map(_.toLong)
      assert(got == expected(p), s"probe $p")
      val rr = r.getAs[Long]("rr_ppm")
      assert(rr == got.map(1000000L / _).getOrElse(0L), s"probe $p")
      assert(lattice.contains(rr), s"probe $p rr=$rr")
    }
  }

  test("q_text_source_kl matches a pure-Scala recompute and respects " +
    "the Gibbs bound up to fxlog2 truncation") {
    val docs = spark.read
      .parquet(s"${SharedSpark.sf001}/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)))
    val cs: Map[(String, String), Long] = docs.groupBy(_._1).toSeq
      .flatMap { case (src, xs) =>
        xs.flatMap(_._2).groupBy(identity).map { case (w, ys) =>
          (src, w) -> ys.length.toLong
        }
      }.toMap
    val cc: Map[String, Long] = cs.toSeq.groupBy(_._1._2)
      .map { case (w, xs) => w -> xs.map(_._2).sum }
    val nC = cc.values.sum
    val bySrc = cs.toSeq.groupBy(_._1._1)
    val expected = bySrc.map { case (src, xs) =>
      val nS = xs.map(_._2).sum
      val kl = xs.map { case ((_, w), cSw) =>
        cSw * (FxLog2.fxlog2(cSw * nC) - FxLog2.fxlog2(cc(w) * nS))
      }.sum
      src -> (nS, xs.size.toLong, kl)
    }
    val out = SparkEntry.queries("q_text_source_kl")(
      spark, SharedSpark.sf001).collect()
    assert(out.length == expected.size)
    out.foreach { r =>
      val src = r.getAs[String]("source")
      val (nS, nTypes, kl) = expected(src)
      assert(r.getAs[Long]("n_toks") == nS, src)
      assert(r.getAs[Long]("n_types") == nTypes, src)
      assert(r.getAs[Long]("kl_fx") == kl, src)
      // Gibbs: KL >= 0 for the true value; each fxlog2 call truncates
      // by < 2^-28 in log2 units (FxLog2Spec's corrected bound), i.e.
      // <= 4 fx units, weighted by c_sw — the exact-form sum therefore
      // sits above -4*n_s
      assert(kl >= -4 * nS, s"$src kl=$kl")
    }
  }
}
