package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson/Spärck Jones probabilistic
  * relevance framework; the Okapi BM25 formulation with the standard
  * k1/b parameters) over a tokenized document corpus.
  *
  * Shape at 100TB: the query-term set is a literal IN-list, so the
  * per-token filter collapses the exploded token stream to query-term
  * hits before any shuffle; (doc, term) tf aggregates with map-side
  * combine; corpus stats (N, avgdl) and per-term document frequencies
  * are single-row / query-term-sized frames joined by broadcast — the
  * corpus itself shuffles once, keyed by doc, and the final top-k is
  * TakeOrderedAndProject (heap per partition, no global sort
  * materialization).
  *
  * No DuckDB oracle by design: ln() is not bit-stable across engine
  * libms (see CLAUDE.md cross-engine rules); Bm25Spec checks the
  * scores against an independent in-test computation instead.
  */
object Bm25 {

  /** Top-k docs for `terms`, scored sum_t idf(t) * tf*(k1+1) /
    * (tf + k1*(1-b + b*dl/avgdl)), idf(t) = ln(1 + (N-df+0.5)/(df+0.5)).
    * Output: (idCol, score, n_terms_hit), score descending, id
    * tiebreak.
    */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol), Text.tokens(col(textCol)).as("toks"))
    val withDl = toks.select(col(idCol), col("toks"),
      size(col("toks")).cast("double").as("dl"))

    // corpus stats: one row, broadcast everywhere
    val stats = withDl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))

    // (doc, term) -> tf, only for query terms (filter before shuffle)
    val tf = withDl
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

    // per-term document frequency: at most terms.size rows
    val df = tf.groupBy("term")
      .agg(countDistinct(col(idCol)).cast("double").as("df"))

    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col(idCol))
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
