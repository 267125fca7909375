package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming as-of price enrichment — the live form of the price lane
  * (reference `bitcoin_pricing/ingest_prices.sh` feeds a quote table;
  * `q_price_spread_asof` / [[graft.ops.AsOf]] are its batch consumers):
  * one interleaved feed per exchange carries quote events and trade
  * events, and every trade is emitted enriched with the latest quote
  * at or before its event time (LOCF as-of semantics).
  *
  * State per exchange is the most recent [[QuoteCap]] quotes, totally
  * ordered by (q_ms, quote_id) — a bounded ring, O(cap) forever (the
  * s_stream_funnel bounded-buffer posture). Each micro-batch first
  * folds its quotes into the ring, then prices its trades against the
  * updated ring, so a quote and a trade arriving in the SAME batch
  * see each other exactly as the batch as-of join would.
  *
  * Exactness contract (pinned in StreamingSpec against the batch
  * [[graft.ops.AsOf]]-style recompute): the incremental output equals
  * the batch as-of join whenever (a) every quote with q_ms <= t_ms has
  * arrived by the batch that carries the trade (quotes prefix-complete
  * per batch; trades may be arbitrarily out of order), and (b) the
  * trade's lookback stays within the newest [[QuoteCap]] quotes. A
  * trade older than the whole ring reports priced = false rather than
  * silently matching a too-new quote.
  *
  * Shape at scale: each trigger shuffles only the new events to their
  * exchange key; emitted rows are the batch's trades only.
  */
object StatefulPriceAsOf {

  /** Default quote-ring capacity per exchange. */
  val QuoteCap = 64

  final case class Enriched(
      exchange: String, trade_id: Long, t_ms: Long, qty: Long,
      px_ms: Long, px_cents: Long, priced: Boolean)

  /** Pure fold: (quote ring, batch quotes, batch trades) → (next ring,
    * enriched trades). Shared by the streaming operator and the spec's
    * reference replay. Ring and outputs are deterministic for ANY
    * within-batch row order: quotes apply before trades, both sides
    * totally ordered by (ms, id). */
  def fold(
      ring: Vector[(Long, Long, Long)], // (q_ms, quote_id, cents) asc
      quotes: Seq[(Long, Long, Long)],  // (q_ms, quote_id, cents)
      trades: Seq[(Long, Long, Long)],  // (t_ms, trade_id, qty)
      cap: Int = QuoteCap): (Vector[(Long, Long, Long)], Seq[(Long, Long, Long, Long, Long, Boolean)]) = {
    val merged = (ring ++ quotes)
      .sortBy(q => (q._1, q._2))
      .takeRight(cap) // keep the newest `cap` quotes
    val out = trades.sortBy(t => (t._1, t._2)).map { case (tMs, tId, qty) =>
      // largest (q_ms, quote_id) with q_ms <= t_ms. Eviction keeps the
      // NEWEST cap quotes, so any i >= 0 hit dominates every evicted
      // quote (all evicted < ring head <= hit <= t_ms); a trade older
      // than the whole ring gets i = -1 and reports priced = false —
      // never a silently-wrong newer quote.
      val i = merged.lastIndexWhere(_._1 <= tMs)
      if (i >= 0) {
        val q = merged(i)
        (tId, tMs, qty, q._1, q._3, true)
      } else (tId, tMs, qty, -1L, 0L, false)
    }
    (merged, out)
  }

  /** `events` columns: exchange (string key), kind ('Q' quote | 'T'
    * trade), ms (event time), id (unique per kind), v (quote cents or
    * trade qty). Emits this batch's trades, enriched. */
  def enrich(
      spark: SparkSession,
      events: DataFrame,
      cap: Int = QuoteCap): Dataset[Enriched] = {
    import spark.implicits._
    events
      .select(col("exchange").cast("string"), col("kind").cast("string"),
        col("ms").cast("long"), col("id").cast("long"),
        col("v").cast("long"))
      .as[(String, String, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Vector[(Long, Long, Long)], Enriched](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val batch = rows.toSeq
          val quotes = batch.collect { case (_, "Q", ms, id, v) => (ms, id, v) }
          val trades = batch.collect { case (_, "T", ms, id, v) => (ms, id, v) }
          val (ring, out) =
            fold(state.getOption.getOrElse(Vector.empty), quotes, trades, cap)
          state.update(ring)
          out.iterator.map { case (tId, tMs, qty, pxMs, pxC, ok) =>
            Enriched(key, tId, tMs, qty, pxMs, pxC, ok)
          }
      }
  }
}
