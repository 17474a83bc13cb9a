package graft.tools

import java.util.concurrent.ConcurrentLinkedDeque

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: per-batch metrics captured off the query
  * progress events — rows in, processing duration, input/processing
  * rates — the numbers behind "is the pipeline keeping up with the
  * topic" (the reference's readme pins `maxOffsetsPerTrigger` = 200k per
  * 30 s; this listener is how you'd verify the real rate against that
  * ceiling). Driver-side, O(keep) memory, no effect on the query plan.
  */
final class BatchMetricsListener(keep: Int = 256) extends StreamingQueryListener {

  final case class BatchMetric(queryName: String, batchId: Long,
                               numInputRows: Long, processedRowsPerSecond: Double,
                               triggerExecutionMs: Long)

  private val buf = new ConcurrentLinkedDeque[BatchMetric]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    buf.addLast(BatchMetric(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      p.processedRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(-1L)))
    while (buf.size() > keep) buf.pollFirst()
  }

  /** Snapshot, oldest first. */
  def metrics: Seq[BatchMetric] = {
    val it = buf.iterator()
    val b = Seq.newBuilder[BatchMetric]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Total rows observed across captured batches. */
  def totalRows: Long = metrics.map(_.numInputRows).sum
}

object BatchMetricsListener {
  /** Attach a fresh listener to the session; caller keeps the handle. */
  def attach(spark: SparkSession, keep: Int = 256): BatchMetricsListener = {
    val l = new BatchMetricsListener(keep)
    spark.streams.addListener(l)
    l
  }
}
