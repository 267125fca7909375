package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Wave 76 — q_curation_dup_inflation: per-source duplication
  * inflation (the "effective epochs" readout a mixture-balancing pass
  * reads next to q_text_source_kl): exact-duplicate docs beyond the
  * corpus-wide keep-first copy, their char mass, and the inflated-vs-
  * effective ratio. Lee et al. (arXiv 2107.06499 §3) motivate exactly
  * this per-source accounting — a source that is 40% copies
  * contributes fewer effective tokens than its raw count claims.
  */
object Wave76 {

  /** Shape at 100TB: one md5 fingerprint per doc, one
    * fingerprint-partitioned keep-first window (the q_dedup_exact
    * shuffle), one aggregate to the source dictionary. inflation_ppm
    * = raw_chars·1e6 div effective_chars (≥ 1e6 by construction;
    * 2e6 = "this source is two epochs of itself"). */
  val curationDupInflation: Q = Q(
    "q_curation_dup_inflation",
    """WITH fp AS (SELECT doc_id, source, n_chars,
      |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id)
      |      AS rn
      |  FROM documents),
      |s AS (SELECT source,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_dup_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS chars,
      |    CAST(SUM(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT)
      |      AS dup_chars
      |  FROM fp GROUP BY 1)
      |SELECT source, n_docs, n_dup_docs, chars, dup_chars,
      |  dup_chars * 1000000 // chars AS dup_share_ppm,
      |  CASE WHEN chars - dup_chars > 0
      |       THEN chars * 1000000 // (chars - dup_chars)
      |  END AS inflation_ppm
      |FROM s ORDER BY source""".stripMargin) { (s, d) =>
    val byFp = Window.partitionBy(md5(col("text"))).orderBy("doc_id")
    val fp = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_chars"), col("text"))
      .withColumn("rn", row_number().over(byFp))
    fp.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("n_chars")).as("chars"),
        sum(when(col("rn") > 1, col("n_chars")).otherwise(0L))
          .as("dup_chars"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        col("chars"), col("dup_chars"),
        expr("dup_chars * 1000000 div chars").as("dup_share_ppm"),
        expr("""CASE WHEN chars - dup_chars > 0
               |THEN chars * 1000000 div (chars - dup_chars)
               |END""".stripMargin).as("inflation_ppm"))
      .orderBy("source")
  }

  val all: Seq[Q] = Seq(curationDupInflation)
}
