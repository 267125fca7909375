package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed Aggregator — the
  * bounded-memory answer to "which terms dominate this 100TB corpus"
  * when an exact groupBy(term) would shuffle billions of distinct keys.
  *
  * The summary keeps at most `k` counters. Estimates are downward
  * biased: for every item, est(x) <= true(x) <= est(x) + n/(k+1), and
  * every item with true frequency > n/(k+1) is guaranteed present
  * (Misra & Gries 1982). Partial aggregates merge by counter-wise sum
  * followed by subtracting the (k+1)-th largest count (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012) — the error bound survives
  * arbitrary merge trees, which is exactly Spark's partial-aggregation
  * contract.
  *
  * Estimates (not the guarantee) depend on input order, so this is a
  * no-oracle capability: FreqItemsSpec checks the order-independent
  * bounds instead.
  */
final case class FreqItems(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, "capacity must be >= 1")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(n) => b.updated(x, n + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // classic decrement step: the new item and one unit of every
        // tracked counter annihilate each other
        b.flatMap { case (t, n) => if (n > 1) Some(t -> (n - 1)) else None }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (acc, (t, n)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + n)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count from everything; at most k
      // counters can stay positive afterwards
      val cut = combined.valuesIterator.toArray.sortBy(-_).apply(k)
      combined.flatMap { case (t, n) =>
        if (n > cut) Some(t -> (n - cut)) else None
      }
    }
  }

  def finish(b: Map[String, Long]): Map[String, Long] = b

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
