package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path

import graft.sink.PartitionedParquetSink

class PartitionedSinkSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("batch rewrites only touched partitions; untouched files stay put") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-psink").toString
    val sink = new PartitionedParquetSink(root)

    // batch 1: two days
    sink.merge("shop", "users",
      Seq(("1", 100L, "u", "ann", "2024-01-01"),
          ("2", 101L, "u", "bob", "2024-01-02"))
        .toDF("pk", "ts_ms", "op", "payload", "ts_date"),
      keyCol = "pk", opCol = "op", deleteMarker = "d")

    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val day1 = new Path(s"$root/shop/users/ts_date=2024-01-01")
    def day1State() = fs.listStatus(day1)
      .map(s => (s.getPath.getName, s.getModificationTime, s.getLen)).toSet
    val day1Before = day1State()

    // batch 2: touches only day 2 (update bob, add cat)
    Thread.sleep(1100) // ensure an mtime change would be visible
    sink.merge("shop", "users",
      Seq(("2", 200L, "u", "bob2", "2024-01-02"),
          ("3", 201L, "u", "cat", "2024-01-02"))
        .toDF("pk", "ts_ms", "op", "payload", "ts_date"),
      "pk", "op", "d")

    assert(day1State() == day1Before,
      "day-1 partition must be byte-for-byte untouched")
    val all = spark.read.parquet(s"$root/shop/users")
      .select("pk", "payload", "ts_date")
      .as[(String, String, java.sql.Date)].collect()
      .map { case (pk, p, d) => (pk, p, d.toString) }.toSet
    assert(all == Set(
      ("1", "ann", "2024-01-01"),
      ("2", "bob2", "2024-01-02"),
      ("3", "cat", "2024-01-02")))

    // batch 3: delete in day 1 — late data reopens exactly that partition
    sink.merge("shop", "users",
      Seq(("1", 300L, "d", "ann", "2024-01-01"))
        .toDF("pk", "ts_ms", "op", "payload", "ts_date"),
      "pk", "op", "d")
    val after = spark.read.parquet(s"$root/shop/users")
      .select("pk").as[String].collect().toSet
    assert(after == Set("2", "3"))
  }
}
