package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState: gap-based session
  * windows emitted on timeout — the stateful-streaming analog of
  * [[graft.ops.Sessionize]] (and of the reference's per-entity
  * accumulation that lived in its worker pool, `ThreadHelpers.java`,
  * re-expressed as managed per-key state with timeouts).
  *
  * State per user is O(1) (open-session aggregate only). Sessions
  * close (a) immediately when a later in-order event arrives past the
  * gap (event-time), or (b) via an idle timeout of `gapMs` — a
  * PROCESSING-time one in [[sessionize]] (pragmatic for live streams
  * where wall clock tracks event time), or a WATERMARK-driven
  * EVENT-time one in [[sessionizeEventTime]] (correct for historical
  * backfills, where replay speed and event time diverge).
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts_ms: Long)
  final case class OpenSession(start_ms: Long, end_ms: Long, n: Long)
  final case class ClosedSession(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  /** `useTimeouts = false` disables the idle-timeout close (sessions
    * then close only when a later event arrives past the gap) — used by
    * deterministic tests; production keeps the timeout so the LAST
    * session of an idle key still flushes. */
  def sessionize(
      spark: SparkSession,
      events: DataFrame,
      gapMs: Long,
      useTimeouts: Boolean = true): Dataset[ClosedSession] = {
    import spark.implicits._
    val timeoutMode =
      if (useTimeouts) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .selectExpr("user_id", "ts_ms")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), timeoutMode) {
        (user: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, s.start_ms, s.end_ms, s.n))
          } else {
            val (closed, open) = processBatch(user, rows.toSeq, gapMs, state.getOption)
            open.foreach { s =>
              state.update(s)
              if (useTimeouts) state.setTimeoutDuration(gapMs)
            }
            closed.iterator
          }
      }
  }

  /** Sessionize an ASCENDING event run: fold each event into the open
    * session when it is within `gapMs` of the session interval on
    * either side (out-of-order events within the gap extend start_ms /
    * end_ms, never rewind), else close and start anew. Pure
    * (Option-in / Option-out): no mutable capture. */
  private def sessionRun(
      user: Long,
      events: Seq[Event],
      gapMs: Long,
      initial: Option[OpenSession]): (Seq[ClosedSession], Option[OpenSession]) = {
    val closed = Seq.newBuilder[ClosedSession]
    val open = events.foldLeft(initial) { (openAcc, e) =>
      openAcc match {
        case Some(s) if e.ts_ms >= s.start_ms - gapMs && e.ts_ms - s.end_ms <= gapMs =>
          Some(s.copy(
            start_ms = math.min(s.start_ms, e.ts_ms),
            end_ms = math.max(s.end_ms, e.ts_ms),
            n = s.n + 1))
        case Some(s) =>
          closed += ClosedSession(user, s.start_ms, s.end_ms, s.n)
          Some(OpenSession(e.ts_ms, e.ts_ms, 1))
        case None =>
          Some(OpenSession(e.ts_ms, e.ts_ms, 1))
      }
    }
    (closed.result(), open)
  }

  /** One micro-batch for one user. Events older than the open session's
    * gap edge (cross-batch stragglers) must not be absorbed into a
    * session they are not within gap of; they are sessionized TOGETHER
    * (stragglers within gap of each other merge) and all resulting late
    * sessions close at end of batch — with O(1) state we cannot keep a
    * second open session for them, so a straggler arriving in a LATER
    * batch within gap of these starts a fresh late session (the
    * bounded-state tradeoff; the batch analog would merge them). */
  private def processBatch(
      user: Long,
      batch: Seq[Event],
      gapMs: Long,
      open: Option[OpenSession]): (Seq[ClosedSession], Option[OpenSession]) = {
    val sorted = batch.sortBy(_.ts_ms)
    val (stragglers, current) = open match {
      case Some(s) => sorted.partition(_.ts_ms < s.start_ms - gapMs)
      case None => (Seq.empty[Event], sorted)
    }
    val (lateClosed, lateOpen) = sessionRun(user, stragglers, gapMs, None)
    val (curClosed, curOpen) = sessionRun(user, current, gapMs, open)
    val allLate = lateClosed ++
      lateOpen.map(s => ClosedSession(user, s.start_ms, s.end_ms, s.n))
    (allLate ++ curClosed, curOpen)
  }

  /** Event-time variant: the idle timeout fires when the WATERMARK
    * passes `end_ms + gapMs`, so sessions close by stream progress, not
    * wall clock — replay-speed-independent (correct for backfills).
    * `events` must carry a TimestampType column `ts` (the watermark
    * column) alongside `user_id`; `lateness` bounds state. */
  def sessionizeEventTime(
      spark: SparkSession,
      events: DataFrame,
      gapMs: Long,
      lateness: String = "10 minutes"): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", lateness)
      .selectExpr("user_id", "ts", "CAST(unix_millis(ts) AS LONG) AS ts_ms")
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
            state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(user, s.start_ms, s.end_ms, s.n))
          } else {
            val events = rows.map(r => Event(r._1, r._3)).toSeq
            val (closed, open) = processBatch(user, events, gapMs, state.getOption)
            open.foreach { s =>
              state.update(s)
              // fires once the watermark (event time) passes the gap edge
              state.setTimeoutTimestamp(s.end_ms + gapMs)
            }
            closed.iterator
          }
      }
  }
}
