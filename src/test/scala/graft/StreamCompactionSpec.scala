package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{CdcEvent, StreamCompaction}

class StreamCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  def ev(pk: String, ts: Long, off: Long, v: String, op: String = "u") =
    CdcEvent("db", "t", pk, ts, off, op, v)

  test("stateful compaction emits only newer versions across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[CdcEvent]
    val out = StreamCompaction.latestPerKeyStateful(in.toDS(), "10 minutes")
    val q = out.writeStream.format("memory").queryName("compacted")
      .outputMode(OutputMode.Append).start()

    // batch 1: two versions of k1 in one batch → only the newest emitted
    in.addData(ev("k1", 100, 0, "a"), ev("k1", 200, 1, "b"), ev("k2", 100, 2, "x"))
    q.processAllAvailable()
    // batch 2: stale k1 replay (dropped), newer k2, new k3
    in.addData(ev("k1", 150, 3, "stale"), ev("k2", 300, 4, "y"), ev("k3", 100, 5, "z"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("compacted").as[CdcEvent].collect()
      .map(e => (e.pk, e.payload)).toList
    assert(rows.count { case (pk, _) => pk == "k1" } == 1)
    assert(rows.contains(("k1", "b")) && !rows.exists(_._2 == "stale"))
    assert(rows.filter(_._1 == "k2").map(_._2).toSet == Set("x", "y"))
    assert(rows.contains(("k3", "z")))
  }

  test("streaming corpus dedup: first fingerprint wins across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = StreamCompaction.firstPerFingerprint(
      in.toDS().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("streamdedup")
      .outputMode(OutputMode.Append).start()
    // batch 1: B and its in-batch duplicate (normalization-equal) → min id
    in.addData((2L, "THE  quick fox"), (1L, "the quick fox"), (3L, "other doc"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate of A (suppressed) + a new doc
    in.addData((9L, "the quick  FOX"), (4L, "brand new content"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("streamdedup")
      .select("id").as[Long].collect().toSet
    assert(rows == Set(1L, 3L, 4L),
      s"expected first-occurrence ids, got $rows")
  }

  test("dropDuplicatesWithinWatermark suppresses exact redeliveries") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[CdcEvent]
    val out = StreamCompaction.dedupeWithinWatermark(in.toDS().toDF())
    val q = out.writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append).start()
    in.addData(ev("k1", 100, 0, "a"), ev("k1", 100, 0, "a"))
    q.processAllAvailable()
    in.addData(ev("k1", 100, 0, "a")) // redelivery in the next batch
    q.processAllAvailable()
    q.stop()
    assert(spark.table("deduped").count() == 1)
  }
}
