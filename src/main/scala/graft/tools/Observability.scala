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

/** DRIFT-IN-QUERY-PROGRESS: the r13 drift detectors (PSI tick, CUSUM
  * tick, a bucket-edge KS) surfaced through Structured Streaming's own
  * observability channel instead of a DataFrame the operator must poll.
  *
  * Mechanism — `Dataset.observe`, the Spark-native hook: the monitor
  * declares ONE row count + nBuckets conditional bucket counts as
  * observed metrics on the streaming DataFrame, Spark computes them
  * INSIDE the query's existing pass (zero extra scan, zero shuffle),
  * and every `StreamingQueryProgress` carries the per-batch values. The
  * [[DriftMetricsListener]] then does only nBuckets-sized driver
  * arithmetic per batch:
  *
  *  - PSI of the batch against the frozen [[graft.ext.DataQuality.PsiProfile]]
  *    (identical formula to `psiTick` — spec-pinned);
  *  - bucket-edge KS: max |CDF_batch − CDF_ref| over the profile's
  *    bucket edges — a LOWER BOUND on the exact KS D (the bounded-state
  *    streaming form; `ksTest` remains the exact batch tool);
  *  - CUSUM over per-batch row counts (volume drift), the listener
  *    holding one O(1) [[graft.ext.DataQuality.CusumState]] per monitor —
  *    empty batches advance it with x = 0, exactly what a
  *    volume-collapse detector must see.
  *
  * Driver memory: one state + one latest tick per monitor plus a
  * bounded ring of `keep` ticks — O(monitors + keep), never grows.
  */
object DriftMonitor {

  /** Per-monitor configuration: the frozen profile, the PSI alert
    * threshold (0.2 = the classic "significant shift" dial), and an
    * optional (mu, kappa, h) CUSUM over per-batch row counts.
    */
  final case class Conf(profile: graft.ext.DataQuality.PsiProfile,
                        psiAlert: Double = 0.2,
                        cusum: Option[(Long, Long, Long)] = None)

  /** Attach the monitor's observation point: count + per-bucket
    * conditional counts under `name`. Call once while composing the
    * streaming plan; works on batch frames too (progress surfacing is
    * the streaming half).
    */
  def observed(df: org.apache.spark.sql.DataFrame, name: String,
               valueCol: org.apache.spark.sql.Column,
               profile: graft.ext.DataQuality.PsiProfile): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val v = valueCol.cast("double")
    val bucket = profile.edges.foldLeft(lit(1))((acc, e) =>
      acc + when(v > lit(e), 1).otherwise(0))
    val cols = count(when(v.isNotNull, 1)).as("n") +:
      profile.refFrac.indices.map(i =>
        count(when(v.isNotNull && bucket === i + 1, 1)).as(s"c$i"))
    df.observe(name, cols.head, cols.tail: _*)
  }
}

/** The listener half of [[DriftMonitor]]: reads each progress event's
  * observed metrics for every configured monitor, computes the tick
  * values, keeps the latest per monitor + a bounded ring. See the
  * object doc for the three detectors and the memory bound.
  */
final class DriftMetricsListener(monitors: Map[String, DriftMonitor.Conf],
                                 keep: Int = 256)
    extends StreamingQueryListener {
  import graft.ext.DataQuality

  final case class DriftTick(monitor: String, batchId: Long, n: Long,
                             psi: Double, psiAlarm: Boolean,
                             ksEdgeD: Double,
                             cusumUp: Boolean, cusumDown: Boolean)

  private val buf = new ConcurrentLinkedDeque[DriftTick]()
  private val latestTick =
    new java.util.concurrent.ConcurrentHashMap[String, DriftTick]()
  private val cusumStates =
    new java.util.concurrent.ConcurrentHashMap[String, DataQuality.CusumState]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val om = e.progress.observedMetrics
    monitors.foreach { case (name, conf) =>
      val row = om.get(name)
      if (row != null) {
        val n = row.getAs[Long]("n")
        val nb = conf.profile.refFrac.length
        val counts = (0 until nb).map(i => row.getAs[Long](s"c$i"))
        val (psi, ksD) =
          if (n == 0L) (Double.NaN, Double.NaN)
          else {
            val p = (0 until nb).map { i =>
              val fc = math.max(counts(i).toDouble / n, conf.profile.epsilon)
              val fr = math.max(conf.profile.refFrac(i), conf.profile.epsilon)
              (fc - fr) * math.log(fc / fr)
            }.sum
            // CDF compare at the nb-1 internal edges (prefix sums)
            var cdfC = 0.0; var cdfR = 0.0; var d = 0.0
            for (i <- 0 until nb - 1) {
              cdfC += counts(i).toDouble / n
              cdfR += conf.profile.refFrac(i)
              d = math.max(d, math.abs(cdfC - cdfR))
            }
            (p, d)
          }
        val (up, down) = conf.cusum match {
          case None => (false, false)
          case Some((mu, kappa, h)) =>
            val st = cusumStates.getOrDefault(name, DataQuality.CusumState(0L, 0L))
            val (next, u, dn) = DataQuality.cusumTick(st, n, mu, kappa, h)
            cusumStates.put(name, next)
            (u, dn)
        }
        val tick = DriftTick(name, e.progress.batchId, n, psi,
          !psi.isNaN && psi >= conf.psiAlert, ksD, up, down)
        latestTick.put(name, tick)
        buf.addLast(tick)
        while (buf.size() > keep) buf.pollFirst()
      }
    }
  }

  /** Latest tick for a monitor (None before its first non-skipped batch). */
  def latest(name: String): Option[DriftTick] = Option(latestTick.get(name))

  /** Snapshot of the bounded tick ring, oldest first. */
  def ticks: Seq[DriftTick] = {
    val it = buf.iterator()
    val b = Seq.newBuilder[DriftTick]
    while (it.hasNext) b += it.next()
    b.result()
  }
}

object DriftMetricsListener {
  /** Attach a fresh drift listener; caller keeps the handle. */
  def attach(spark: SparkSession, monitors: Map[String, DriftMonitor.Conf],
             keep: Int = 256): DriftMetricsListener = {
    val l = new DriftMetricsListener(monitors, keep)
    spark.streams.addListener(l)
    l
  }
}
