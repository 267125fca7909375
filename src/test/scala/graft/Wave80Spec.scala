package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave 80 invariants: the funnel recomputed from the pipeline's own
  * per-doc verdicts, plus the survivorship identities (conservation,
  * monotone survivor counts, end-to-end yield).
  */
class Wave80Spec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("q_curation_funnel matches a recompute from the pipeline " +
    "verdicts and its survivorship identities hold") {
    val verdicts = SparkEntry.queries("q_curation_pipeline")(
        spark, SharedSpark.sf001)
      .select("verdict").collect().map(_.getString(0))
    val counts = verdicts.groupBy(identity).map { case (v, xs) =>
      v -> xs.length.toLong
    }
    val stages = Seq("eval", "low_quality", "exact_dup", "near_dup",
      "contaminated", "kept")
    assert(counts.keySet.subsetOf(stages.toSet))
    val total = verdicts.length.toLong
    val out = SparkEntry.queries("q_curation_funnel")(spark, SharedSpark.sf001)
      .collect()
    assert(out.map(_.getString(1)).toSeq == stages, "stage order")
    var droppedBefore = 0L
    out.foreach { r =>
      val stage = r.getString(1)
      val n = counts.getOrElse(stage, 0L)
      assert(r.getAs[Long]("n_docs") == n, stage)
      if (stage == "kept") {
        assert(r.getAs[Long]("n_entering") == n, stage)
        assert(r.getAs[Long]("retained_ppm") == n * 1000000L / total, stage)
      } else {
        val entering = total - droppedBefore
        assert(r.getAs[Long]("n_entering") == entering, stage)
        assert(r.getAs[Long]("retained_ppm") ==
          (entering - n) * 1000000L / entering, stage)
        droppedBefore += n
      }
    }
    // conservation: every doc is claimed by exactly one stage
    assert(out.map(_.getAs[Long]("n_docs")).sum == total)
    // the last drop stage's survivors ARE the kept corpus
    assert(total - droppedBefore == counts.getOrElse("kept", 0L))
  }
}
