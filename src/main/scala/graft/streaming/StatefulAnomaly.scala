package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Continuous z-score anomaly detection via mapGroupsWithState — the
  * streaming twin of q_anomaly_zscore: per key the state is the
  * running integer moments (n, Σx, Σx²) plus a cumulative flagged
  * count. Every micro-batch folds its rows in (moments are a
  * commutative monoid, so within-batch order cannot matter) and flags
  * the batch's rows against the END-OF-BATCH moments with the
  * all-integer test
  *   (n·x − Σx)² > 9 · (n·Σx² − (Σx)²)
  * — |z| > 3 with the variance denominator multiplied through (z² =
  * n·(n·x−Σx)² / (n·(n·Σx²−(Σx)²)); the common n cancels), evaluated
  * in BigInt so no magnitude ever truncates. The emitted record after
  * each batch is the exact state, so StreamingSpec can pin
  * incremental ≡ a batch fold over the same micro-batch prefix.
  *
  * Shape at scale: O(1) state per key forever; each trigger shuffles
  * only the new (key, value) rows.
  */
object StatefulAnomaly {

  final case class AnomalyUpdate(
      key: String, n: Long, sum_cents: Long, sumsq_cents: Long,
      n_flagged_cum: Long)

  /** Pure fold: (state, batch values) → next state. Shared by the
    * streaming operator and the spec's reference replay. */
  def fold(state: (Long, Long, Long, Long), xs: Seq[Long])
      : (Long, Long, Long, Long) = {
    val (n0, s0, q0, f0) = state
    val n = n0 + xs.length
    val sum = s0 + xs.sum
    val sq = q0 + xs.map(x => x * x).sum
    val varN = BigInt(n) * sq - BigInt(sum) * sum
    val flagged = f0 + xs.count { x =>
      val dev = BigInt(n) * x - sum
      dev * dev > varN * 9
    }
    (n, sum, sq, flagged)
  }

  def anomaly(
      spark: SparkSession,
      events: DataFrame,
      keyCol: String,
      valCol: String): Dataset[AnomalyUpdate] = {
    import spark.implicits._
    events
      .select(col(keyCol).cast("string").as("key"),
        col(valCol).cast("long").as("x"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long), AnomalyUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val next = fold(state.getOption.getOrElse((0L, 0L, 0L, 0L)),
            rows.map(_._2).toSeq)
          state.update(next)
          Iterator.single(
            AnomalyUpdate(key, next._1, next._2, next._3, next._4))
      }
  }
}
