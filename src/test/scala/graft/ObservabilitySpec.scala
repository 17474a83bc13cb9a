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
}
