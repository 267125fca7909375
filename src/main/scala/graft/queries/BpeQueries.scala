package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.text.Bpe

/** Tokenizer training over `documents` — the BPE merge-learning step of
  * an LLM data pipeline (see [[graft.text.Bpe]] for the scale argument:
  * one corpus shuffle to word counts, then K driver-iterated rounds
  * over the compact vocab, Sennrich et al. arXiv 1508.07909).
  *
  * Both queries run the same `Bpe.train` and share the same generated
  * oracle CTE chain, so the learned merges and the resulting vocabulary
  * cannot drift from each other or from the oracle.
  */
object BpeQueries {

  /** Merge rounds to learn. Plenty of pairs remain at every SF (the
    * corpus vocabulary is word-shaped, max symbol runway ~9 per word);
    * `Bpe.train` fails loudly if the corpus ever exhausts pairs. */
  val K = 8

  /** The learned merge table: (step, x, y, pair count at selection,
    * corpus tokens after applying it) — the tokenizer artifact itself,
    * K rows built from the per-round argmax collects. */
  val bpeMerges: Q = Q("q_bpe_merges", Bpe.mergesOracle(K)) { (s, d) =>
    val (merges, _) = Bpe.train(s, d, K)
    import s.implicits._
    merges.toDF("step", "x", "y", "cnt", "toks").orderBy("step")
  }

  /** The post-training symbol vocabulary with corpus occurrence counts
    * and word support — the "what tokens did we learn" audit
    * view, aggregated distributed from the final vocab relation. */
  val bpeVocab: Q = Q("q_bpe_vocab", Bpe.vocabOracle(K)) { (s, d) =>
    val (_, vocab) = Bpe.train(s, d, K)
    vocab
      .select(col("w"), col("freq"), explode(col("syms")).as("sym"))
      .groupBy("sym")
      .agg(sum("freq").as("occurrences"),
        countDistinct("w").as("n_words"))
      .orderBy(col("occurrences").desc, col("sym").asc)
  }

  val all: Seq[Q] = Seq(bpeMerges, bpeVocab)
}
