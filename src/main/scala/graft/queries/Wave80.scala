package graft.queries

import org.apache.spark.sql.functions._

import graft.Q

/** Wave 80 — curation survivorship reporting: the stage-by-stage
  * funnel every pretraining-data team publishes next to its corpus
  * (how many documents each gate dropped, and the end-to-end yield).
  * Reads the per-doc verdicts of the END-TO-END q_curation_pipeline
  * chain (eval holdout → quality → exact dedup → near dedup →
  * decontamination → kept), so the funnel is definitionally
  * consistent with the pipeline's own stage precedence.
  */
object Wave80 {

  private val Stages = Seq(
    (0L, "eval"), (1L, "low_quality"), (2L, "exact_dup"),
    (3L, "near_dup"), (4L, "contaminated"), (5L, "kept"))

  /** q_curation_funnel: one row per pipeline stage in precedence
    * order — n_docs claimed by the stage, n_entering (docs still
    * alive when the stage ran; for 'kept', the final corpus size),
    * and retained_ppm (survival rate through the stage; for 'kept',
    * the end-to-end yield against the full crawl).
    *
    * Shape at 100TB: everything data-sized is the pipeline itself
    * (each stage already pinned in its standalone query); this
    * readout is one verdict-dictionary aggregate plus window
    * arithmetic over SIX rows (BoundedWindow single partition —
    * bounded by the stage list, not the corpus). */
  val curationFunnel: Q = Q(
    "q_curation_funnel",
    // the pipeline SQL is spliced AFTER stripMargin: its g13 CTE has
    // lines beginning with the || concat operator, which stripMargin
    // would truncate to a single | (one verify cycle to learn)
    s"""WITH vz AS (SELECT verdict FROM (
       |INNER_PIPELINE_SQL
       |) pipeline_out),
       |vc AS (SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n
       |       FROM vz GROUP BY 1),
       |st AS (SELECT * FROM (VALUES ${Stages
            .map { case (o, n) => s"($o, '$n')" }.mkString(", ")})
       |       s(ord, stage)),
       |f AS (SELECT st.ord, st.stage, COALESCE(vc.n, 0) AS n
       |      FROM st LEFT JOIN vc ON vc.verdict = st.stage),
       |cum AS (SELECT ord, stage, n,
       |    COALESCE(SUM(n) OVER (ORDER BY ord
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS dropped_before,
       |    SUM(n) OVER () AS total
       |  FROM f)
       |SELECT CAST(ord AS BIGINT) AS ord, stage,
       |  CAST(n AS BIGINT) AS n_docs,
       |  CAST(CASE WHEN stage = 'kept' THEN n
       |            ELSE total - dropped_before END AS BIGINT) AS n_entering,
       |  CAST(CASE WHEN stage = 'kept' THEN n * 1000000 // total
       |            ELSE (total - dropped_before - n) * 1000000
       |                 // (total - dropped_before)
       |       END AS BIGINT) AS retained_ppm
       |FROM cum ORDER BY ord""".stripMargin
      .replace("INNER_PIPELINE_SQL", Wave9.curationPipeline.oracle.get)) { (s, d) =>
    import s.implicits._
    val vc = Wave9.curationPipeline.run(s, d)
      .groupBy("verdict").agg(count(lit(1)).as("vn"))
    val st = Stages.toDF("ord", "stage")
    val f = st.join(vc, col("verdict") === col("stage"), "left")
      .select(col("ord"), col("stage"),
        coalesce(col("vn"), lit(0L)).as("n"))
    val wOrd = graft.ops.BoundedWindow.single(col("ord"))
      .rowsBetween(Long.MinValue, -1)
    val wAll = graft.ops.BoundedWindow.all(col("ord"))
    f.withColumn("dropped_before",
        coalesce(sum(col("n")).over(wOrd), lit(0L)))
      .withColumn("total", sum(col("n")).over(wAll))
      .select(col("ord"), col("stage"), col("n").as("n_docs"),
        when(col("stage") === "kept", col("n"))
          .otherwise(col("total") - col("dropped_before"))
          .as("n_entering"),
        when(col("stage") === "kept",
          expr("n * 1000000 div total"))
          .otherwise(expr(
            """(total - dropped_before - n) * 1000000
              | div (total - dropped_before)""".stripMargin))
          .as("retained_ppm"))
      .orderBy("ord")
  }

  val all: Seq[Q] = Seq(curationFunnel)
}
