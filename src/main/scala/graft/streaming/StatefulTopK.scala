package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Continuous per-key top-k via mapGroupsWithState — the streaming
  * form of [[graft.ops.TopK.perGroup]]: per key the state is the k
  * best (value, id) pairs seen so far (value desc, id asc ties — the
  * batch group-limit's exact ordering), and every micro-batch folds
  * its rows in and re-trims. Because "merge then trim to k" is the
  * top-k monoid, the leaderboard after any prefix of micro-batches
  * equals the batch top-k over the same rows (StreamingSpec pins it
  * on a two-batch stream with displacements).
  *
  * Shape at scale: state per key is k pairs forever; each trigger
  * shuffles only the NEW (key, value, id) rows. This is the
  * always-on leaderboard / alerting shape — top spenders, hottest
  * items — that a batch TopK would recompute from scratch. */
object StatefulTopK {

  final case class TopKUpdate(key: String, rank: Int, id: Long, value: Long)

  def topK(
      spark: SparkSession,
      events: DataFrame,
      keyCol: String,
      idCol: String,
      valCol: String,
      k: Int): Dataset[TopKUpdate] = {
    import spark.implicits._
    events
      .select(col(keyCol).cast("string").as("key"),
        col(idCol).cast("long").as("id"), col(valCol).cast("long").as("v"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Array[(Long, Long)], TopKUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val prev = state.getOption.getOrElse(Array.empty[(Long, Long)])
          val merged = (prev ++ rows.map(r => (r._3, r._2)))
            .distinct
            .sortBy { case (v, id) => (-v, id) }
            .take(k)
          state.update(merged)
          merged.iterator.zipWithIndex.map { case ((v, id), i) =>
            TopKUpdate(key, i + 1, id, v)
          }
      }
  }
}
