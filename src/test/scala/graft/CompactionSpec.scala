package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.compact.Compaction

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("latestPerKey keeps exactly the highest (ts, tiebreaker) row per key") {
    val df = Seq(
      ("a", 1L, 10L, "v1"), ("a", 3L, 11L, "v2"), ("a", 3L, 12L, "v3"),
      ("b", 5L, 1L, "w1")
    ).toDF("pk", "ts", "off", "v")
    val out = Compaction.latestPerKey(df, Seq("pk"), Seq("ts", "off"))
      .select("pk", "v").as[(String, String)].collect().toMap
    assert(out == Map("a" -> "v3", "b" -> "w1"))
  }

  test("tie on ts resolves by the tiebreaker deterministically") {
    // same ts for all three; highest offset must win every run
    val df = Seq(("k", 7L, 1L, "x"), ("k", 7L, 3L, "y"), ("k", 7L, 2L, "z"))
      .toDF("pk", "ts", "off", "v")
    (1 to 5).foreach { _ =>
      val out = Compaction.latestPerKey(df, Seq("pk"), Seq("ts", "off"))
        .select("v").as[String].collect()
      assert(out.toSeq == Seq("y"))
    }
  }

  test("aggregate-form compaction is row-identical to the window form (fuzz)") {
    val rnd = new scala.util.Random(11)
    (1 to 10).foreach { trial =>
      val rows = Seq.fill(200)((s"k${rnd.nextInt(12)}",
        rnd.nextInt(20).toLong, rnd.nextLong().abs, s"v${rnd.nextInt(1000)}"))
      val df = rows.toDF("pk", "ts", "off", "v")
      val win = Compaction.latestPerKey(df, Seq("pk"), Seq("ts", "off"))
        .as[(String, Long, Long, String)].collect().toSet
      val agg = Compaction.latestPerKeyAgg(df, Seq("pk"), Seq("ts", "off"))
        .as[(String, Long, Long, String)].collect().toSet
      assert(agg == win, s"trial $trial diverged")
    }
    // column order is preserved by the agg form
    val df = Seq(("a", 1L, 2L, "x")).toDF("pk", "ts", "off", "v")
    assert(Compaction.latestPerKeyAgg(df, Seq("pk"), Seq("ts", "off"))
      .columns.toSeq == Seq("pk", "ts", "off", "v"))
  }

  test("targets = distinct key pairs") {
    val df = Seq(("d1", "t1"), ("d1", "t1"), ("d1", "t2"), ("d2", "t1"))
      .toDF("db_name", "tb_name")
    val out = Compaction.targets(df, Seq("db_name", "tb_name"))
      .as[(String, String)].collect().toSet
    assert(out == Set(("d1", "t1"), ("d1", "t2"), ("d2", "t1")))
  }
}
