package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming histogram-quantile sketch via mapGroupsWithState — the
  * incremental twin of the batch `q_sketch_quantile_fx`, with the
  * IDENTICAL portable construction: 64 equi-width buckets over a
  * FROZEN [mn, mx] value range (trained by a batch pass, the same
  * frozen-artifact posture as the streaming PQ encoder) and the median
  * read out by exact-integer interpolation. Per key the state is 64
  * bucket counts — fixed forever — and every micro-batch folds its
  * values in by bucket-wise addition. Addition is associative and
  * commutative, so the sketch after any prefix of micro-batches equals
  * the batch sketch over the same rows (StreamingSpec pins
  * incremental ≡ batch), and two keys' states merge bucket-wise — the
  * shard-rollup property shared by the whole sketch family (HLL, KMV,
  * CMS, histogram).
  *
  * Shape at scale: state per key is 64 longs regardless of stream
  * length; each trigger shuffles only the new (key, value) pairs; the
  * estimate is integer walk + one floor division — no floats.
  */
object StatefulQuantile {

  final case class QuantUpdate(key: String, n: Long, est_med: Long)

  /** Bucket index of a value — mirrors the batch SQL's
    * LEAST(63, (v - mn) * 64 // (mx - mn + 1)), clamped below for
    * out-of-range stream values the frozen range never saw. */
  private[streaming] def bucketOf(v: Long, mn: Long, mx: Long): Int =
    math.max(0L, math.min(63L, (v - mn) * 64 / (mx - mn + 1))).toInt

  /** Median estimate from a 64-bucket state — the batch readout:
    * bucket lower edge plus within-bucket linear interpolation, all
    * floor divisions of non-negative integers. */
  private[streaming] def estimate(
      counts: Array[Long], mn: Long, mx: Long): (Long, Long) = {
    val n = counts.sum
    if (n == 0L) return (0L, mn)
    val target = (n + 1) / 2
    var cum = 0L
    var i = 0
    while (cum + counts(i) < target) { cum += counts(i); i += 1 }
    val width = mx - mn + 1
    val est = mn + width * i / 64 +
      (width / 64) * (target - cum - 1) / counts(i)
    (n, est)
  }

  def medianSketch(
      spark: SparkSession,
      events: DataFrame,
      keyCol: String,
      valCol: String,
      mn: Long,
      mx: Long): Dataset[QuantUpdate] = {
    import spark.implicits._
    events
      .select(col(keyCol).cast("string").as("key"),
        col(valCol).cast("long").as("v"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], QuantUpdate](
        GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val counts = state.getOption.getOrElse(new Array[Long](64))
          rows.foreach { case (_, v) => counts(bucketOf(v, mn, mx)) += 1 }
          state.update(counts)
          val (n, est) = estimate(counts, mn, mx)
          QuantUpdate(key, n, est)
      }
  }
}
