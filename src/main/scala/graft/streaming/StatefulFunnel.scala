package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming funnel-stage tracking via mapGroupsWithState — the
  * incremental twin of the batch `q_funnel_stages`: per user, the
  * strictly-ordered signup → click → purchase chain where each stage's
  * timestamp is the FIRST qualifying event at-or-after the previous
  * stage. Because a LATE-arriving earlier signup can legally re-select
  * a different (earlier) click — and that click a different purchase —
  * the recursion is not a per-stage min monoid; the state is instead
  * the first-`cap` event times per stage type (kept sorted), which
  * makes the stage recompute exact for any arrival order whenever a
  * user has at most `cap` events of a type (the q_seq_events payload
  * cap pattern — bounded state, documented contract). StreamingSpec
  * pins incremental ≡ the batch window formula at every micro-batch
  * prefix, including a late signup that rewrites the click selection.
  *
  * Shape at scale: state per user is ≤ 3·cap longs forever; each
  * trigger shuffles only the new (user, type, ms) rows.
  */
object StatefulFunnel {

  final case class FunnelUpdate(
      user_id: Long,
      n_events: Long,
      signup_ms: Option[Long],
      click_ms: Option[Long],
      purchase_ms: Option[Long],
      stage: Long)

  private def insertCapped(xs: Seq[Long], m: Long, cap: Int): Seq[Long] =
    (xs :+ m).sorted.take(cap)

  /** The batch semantics over the retained per-type times. */
  private[streaming] def readout(
      uid: Long, n: Long,
      ss: Seq[Long], cs: Seq[Long], ps: Seq[Long]): FunnelUpdate = {
    val signup = ss.headOption
    val click = signup.flatMap(s => cs.find(_ >= s))
    val purchase = click.flatMap(c => ps.find(_ >= c))
    val stage =
      if (signup.isEmpty) 0L
      else if (purchase.isDefined) 3L
      else if (click.isDefined) 2L
      else 1L
    FunnelUpdate(uid, n, signup, click, purchase, stage)
  }

  def stages(
      spark: SparkSession,
      events: DataFrame,
      userCol: String,
      typeCol: String,
      msCol: String,
      cap: Int = 40): Dataset[FunnelUpdate] = {
    import spark.implicits._
    events
      .select(col(userCol).cast("long").as("uid"),
        col(typeCol).cast("string").as("t"),
        col(msCol).cast("long").as("m"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Seq[Long], Seq[Long], Seq[Long]), FunnelUpdate](
        GroupStateTimeout.NoTimeout) {
        (uid, rows, state) =>
          var (n, ss, cs, ps) = state.getOption
            .getOrElse((0L, Seq.empty[Long], Seq.empty[Long], Seq.empty[Long]))
          rows.foreach { case (_, t, m) =>
            n += 1
            t match {
              case "signup" => ss = insertCapped(ss, m, cap)
              case "click" => cs = insertCapped(cs, m, cap)
              case "purchase" => ps = insertCapped(ps, m, cap)
              case _ => ()
            }
          }
          state.update((n, ss, cs, ps))
          readout(uid, n, ss, cs, ps)
      }
  }
}
