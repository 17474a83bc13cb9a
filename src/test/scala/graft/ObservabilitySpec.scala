package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.tools.BatchMetricsListener

class ObservabilitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("listener captures per-batch rows and durations") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val listener = BatchMetricsListener.attach(spark)
    try {
      val in = MemoryStream[Int]
      val q = in.toDF().writeStream.format("memory")
        .queryName("obs_sink").outputMode(OutputMode.Append).start()
      in.addData(1, 2, 3)
      q.processAllAvailable()
      in.addData(4, 5)
      q.processAllAvailable()
      q.stop()
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (listener.totalRows < 5 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(listener.totalRows == 5)
      val withRows = listener.metrics.filter(_.numInputRows > 0)
      assert(withRows.map(_.numInputRows).sorted == Seq(2L, 3L))
      assert(withRows.forall(_.triggerExecutionMs >= 0))
    } finally spark.streams.removeListener(listener)
  }

  test("drift listener: a drifted batch surfaces PSI/KS/CUSUM alarms " +
      "through query progress; healthy batch stays quiet; ring bounded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ext.DataQuality
    import graft.tools.{DriftMetricsListener, DriftMonitor}
    implicit val sq = spark.sqlContext
    // frozen profile from a uniform 0..99 reference
    val ref = spark.range(1000).select((col("id") % 100).cast("double").as("v"))
    val profile = DataQuality.psiProfile(ref, col("v"), nBuckets = 10)
    val listener = DriftMetricsListener.attach(spark, Map(
      // volume CUSUM: mu=10, kappa=2, h=100 — a 200-row batch alarms
      "doc_len" -> DriftMonitor.Conf(profile, psiAlert = 0.2,
        cusum = Some((10L, 2L, 100L)))), keep = 2)
    try {
      val in = MemoryStream[Int]
      val observed = DriftMonitor.observed(
        in.toDF().select(col("value").cast("double").as("v")),
        "doc_len", col("v"), profile)
      val q = observed.writeStream.format("memory")
        .queryName("drift_sink").outputMode(OutputMode.Append).start()
      def waitTicks(k: Int): Unit = {
        val deadline = System.currentTimeMillis() + 10000
        while (listener.ticks.count(_.n > 0) < k &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      }
      // batch 1: 10 uniform-ish rows — healthy (psi small, cusum quiet)
      in.addData(0 until 100 by 10: _*)
      q.processAllAvailable(); waitTicks(1)
      val healthy = listener.latest("doc_len").get
      assert(healthy.n == 10L && !healthy.psiAlarm && !healthy.cusumUp,
        s"healthy batch must not alarm: $healthy")
      // batch 2: 200 rows all pinned at 99 — distribution AND volume drift
      in.addData(Seq.fill(200)(99): _*)
      q.processAllAvailable(); waitTicks(2)
      val drifted = listener.latest("doc_len").get
      assert(drifted.n == 200L && drifted.psiAlarm,
        s"pinned batch must raise the PSI alarm: $drifted")
      assert(drifted.ksEdgeD > 0.8,
        s"edge-KS must see the CDF collapse: $drifted")
      assert(drifted.cusumUp, s"volume spike must raise CUSUM up: $drifted")
      // the listener's PSI is the psiTick formula exactly (spec pin)
      val batch2 = Seq.fill(200)(99).toDF("v")
      val expectPsi = DataQuality.psiTick(profile, batch2, col("v"))
      assert(math.abs(drifted.psi - expectPsi) < 1e-12,
        s"listener psi ${drifted.psi} != psiTick $expectPsi")
      // bounded ring: keep=2 holds at most the last two ticks
      in.addData(1, 2, 3)
      q.processAllAvailable(); waitTicks(3)
      assert(listener.ticks.size <= 2, s"ring must stay bounded")
      q.stop()
    } finally spark.streams.removeListener(listener)
  }
}
