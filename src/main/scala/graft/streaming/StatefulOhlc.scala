package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Continuously-maintained OHLC candles via mapGroupsWithState — the
  * streaming form of the batch `q_ts_ohlc`: per (series, bucket) key
  * the state is (earliest-event key + its value, max, min,
  * latest-event key + its value, count), each micro-batch folds its
  * rows in, and every fold is a commutative monoid merge (min/max on
  * the packed (ms, id) event keys decide open/close exactly like the
  * batch struct-min/max), so the candle after any prefix of
  * micro-batches equals the batch candle over the same rows — even
  * under out-of-order arrival (StreamingSpec pins a late-data batch).
  *
  * Shape at scale: state per candle is 7 longs forever; each trigger
  * shuffles only the NEW rows to their candle key. */
object StatefulOhlc {

  final case class Candle(
      key: String, n: Long, open: Long, high: Long, low: Long, close: Long)

  // (firstK, open, high, low, lastK, close, n)
  private type S = (Long, Long, Long, Long, Long, Long, Long)

  def candles(
      spark: SparkSession,
      events: DataFrame,
      keyCol: String,
      seqCol: String, // packed (ms, id) event key: unique, time-ordered
      valCol: String): Dataset[Candle] = {
    import spark.implicits._
    events
      .select(col(keyCol).cast("string").as("key"),
        col(seqCol).cast("long").as("k"), col(valCol).cast("long").as("v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[S, Candle](GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          var s = state.getOption.getOrElse(
            (Long.MaxValue, 0L, Long.MinValue, Long.MaxValue, Long.MinValue,
              0L, 0L))
          rows.foreach { case (_, k, v) =>
            val firstK = if (k < s._1) k else s._1
            val open = if (k < s._1) v else s._2
            val lastK = if (k > s._5) k else s._5
            val close = if (k > s._5) v else s._6
            s = (firstK, open, math.max(s._3, v), math.min(s._4, v),
              lastK, close, s._7 + 1)
          }
          state.update(s)
          Candle(key, s._7, s._2, s._3, s._4, s._6)
      }
  }
}
