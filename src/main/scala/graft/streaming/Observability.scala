package graft.streaming

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** R11 observability — the Spark analog of the reference's queue-depth
  * monitor (`Main.java:154-160`: a 5s loop printing the handler and
  * upload queue sizes). In Spark the "queues" are the micro-batch
  * pipeline, so the equivalent signal is per-batch progress: input
  * rows, processing rate, and stateful-operator state size. Attach with
  * `spark.streams.addListener(new ProgressListener)`.
  *
  * Counters are exposed so tests (and callers embedding the engine) can
  * assert liveness instead of scraping logs.
  */
class ProgressListener(quiet: Boolean = false) extends StreamingQueryListener {

  val batchesSeen = new AtomicLong(0)
  val inputRowsSeen = new AtomicLong(0)
  /** State rows of the most recent progress event carrying state
    * operators; high-water mark kept separately since trailing empty
    * batches can report no state. */
  @volatile var lastStateRows: Long = 0L
  val maxStateRows = new AtomicLong(0)

  private def log(msg: String): Unit =
    if (!quiet) println(s"[graft-observe] $msg")

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    log(s"query started id=${event.id} name=${Option(event.name).getOrElse("-")}")

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    batchesSeen.incrementAndGet()
    inputRowsSeen.addAndGet(p.numInputRows)
    lastStateRows =
      Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
    maxStateRows.getAndUpdate(m => math.max(m, lastStateRows))
    log(s"query=${Option(p.name).getOrElse(p.id)} batch=${p.batchId} " +
      s"inputRows=${p.numInputRows} rowsPerSec=${p.processedRowsPerSecond} " +
      s"stateRows=$lastStateRows")
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    log(s"query terminated id=${event.id} " +
      s"exception=${event.exception.getOrElse("none")}")
}
