package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming and batch must agree: the same windowed
  * aggregation over the same events yields identical results whether it
  * runs as one batch or arrives incrementally across micro-batches.
  * This is the property that makes `foreachBatch` replication and
  * backfill-vs-live interchangeable — a backfill through the batch path
  * and a live run through the stream path converge on the same state.
  */
case class ParityEvent(user: String, tsMs: Long, v: Double)

class StreamBatchParitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private type E = ParityEvent
  private def E(user: String, tsMs: Long, v: Double) = ParityEvent(user, tsMs, v)

  test("tumbling-window counts: incremental micro-batches == one batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val events = Seq(
      E("u1", 1000L, 1.0), E("u1", 61000L, 2.0), E("u2", 2000L, 3.0),
      E("u1", 1500L, 4.0), E("u2", 62000L, 5.0), E("u2", 63000L, 6.0))

    def windowed(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .groupBy(col("user"), window(col("ts"), "1 minute").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("v")), 2).as("sum_v"))
      .select(col("user"), col("w.start").as("w_start"), col("n"), col("sum_v"))

    val batch = windowed(events.toDF())
      .as[(String, java.sql.Timestamp, Long, Double)].collect().toSet

    val in = MemoryStream[ParityEvent]
    val q = windowed(in.toDF()).writeStream.format("memory")
      .queryName("parity").outputMode(OutputMode.Complete).start()
    // deliver in three micro-batches, out of event-time order
    in.addData(events(0), events(1))
    q.processAllAvailable()
    in.addData(events(2), events(3))
    q.processAllAvailable()
    in.addData(events(4), events(5))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("parity")
      .as[(String, java.sql.Timestamp, Long, Double)].collect().toSet
    assert(streamed == batch,
      s"stream/batch divergence:\n stream=$streamed\n batch=$batch")
  }

  test("session windows work in streaming mode and match the batch form") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // u1: two events 5 min apart (one session), then one 40 min later
    // (new session); u2: single event
    val events = Seq(
      E("u1", 0L, 1.0), E("u1", 5 * 60 * 1000L, 2.0),
      E("u1", 45 * 60 * 1000L, 3.0), E("u2", 1000L, 4.0))

    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .groupBy(session_window(col("ts"), "10 minutes").as("sw"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("sw.start").as("s_start"), col("n"))

    val batch = sessions(events.toDF())
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    assert(batch.map(t => (t._1, t._3)) ==
      Set(("u1", 2L), ("u1", 1L), ("u2", 1L)))

    val in = MemoryStream[ParityEvent]
    // session_window streaming requires a watermark on the event-time col
    val q2 = in.toDF()
      .withColumn("ts", timestamp_millis(col("tsMs")))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "10 minutes").as("sw"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("sw.start").as("s_start"), col("n"))
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode(OutputMode.Complete).start()
    in.addData(events(0), events(3))
    q2.processAllAvailable()
    in.addData(events(1), events(2)) // arrives in a later micro-batch
    q2.processAllAvailable()
    q2.stop()

    val streamed = spark.table("sess_parity")
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    assert(streamed == batch,
      s"session-window stream/batch divergence:\n stream=$streamed\n batch=$batch")
  }

  test("cms grid: incremental micro-batches == one batch (cell-wise additive)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // the merge property that lets a per-day/per-slice CMS build compose
    // into the corpus sketch: the grid aggregate is an ordinary count,
    // so streaming state IS the running cell-wise sum
    val items = (1 to 300).map(i => s"tok${i % 23}")
    val batch = graft.ext.Sketch
      .cmsCells(items.toDF("item"), "item", depth = 4, width = 64)
      .as[(Int, Long, Long)].collect().toSet

    val in = MemoryStream[String]
    val q = graft.ext.Sketch
      .cmsCells(in.toDF().withColumnRenamed("value", "item"), "item",
        depth = 4, width = 64)
      .writeStream.format("memory").queryName("cms_parity")
      .outputMode(OutputMode.Complete).start()
    items.grouped(100).foreach { g => in.addData(g: _*); q.processAllAvailable() }
    q.stop()

    val streamed = spark.table("cms_parity")
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"cms grid stream/batch divergence:\n stream=$streamed\n batch=$batch")
  }
}
