package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming uniform sample WITH PAYLOAD via deterministic
  * md5-priority bottom-k (the streaming twin of the batch
  * q_sample_* family): per key, the state is the k events whose
  * md5(event_id) hashes are smallest — a uniform-without-replacement
  * sample of everything seen so far, because the hash is a fixed
  * random permutation of event ids. Bottom-k sets are mergeable
  * (union re-trimmed to k IS the bottom-k of the union), so the
  * sample after any micro-batch prefix equals the batch sample over
  * the same rows — unlike classic reservoir sampling, whose
  * coin-flips make the sample arrival-order-dependent and therefore
  * unreplayable. StreamingSpec pins prefix ≡ batch; IngestDemo
  * drives it end-to-end.
  *
  * Shape at scale: O(k) state per key forever; each trigger shuffles
  * only the new (key, hash, payload) rows. This is how live-traffic
  * eval sets stay bounded: the sample is always current, always
  * uniform, and two operators sampling disjoint shards merge to the
  * sample of the union.
  */
object StatefulReservoir {

  final case class SampleUpdate(
      key: String,
      n_sampled: Long,
      sample_ids: Seq[Long],
      sample_fp: String)

  def uniformSample(
      spark: SparkSession,
      events: DataFrame,
      keyCol: String,
      idCol: String,
      k: Int): Dataset[SampleUpdate] = {
    import spark.implicits._
    events
      .select(col(keyCol).cast("string").as("key"),
        col(idCol).cast("long").as("id"),
        md5(col(idCol).cast("string")).as("h"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[(String, Long)], SampleUpdate](
        GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val prev = state.getOption.getOrElse(Array.empty[(String, Long)])
          val merged = (prev ++ rows.map(r => (r._3, r._2)))
            .distinct.sortBy(_._1).take(k)
          state.update(merged)
          val ids = merged.map(_._2).toSeq
          SampleUpdate(key, ids.length.toLong, ids,
            java.security.MessageDigest.getInstance("MD5")
              .digest(merged.map(_._1).mkString(",").getBytes("UTF-8"))
              .map("%02x".format(_)).mkString)
      }
  }
}
