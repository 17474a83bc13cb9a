package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.compact.Compaction
import graft.sink.Merge

/** Properties of the CDC merge semantics (SURVEY.md §5.2): applying event
  * batches through compaction+merge must equal the naive "latest
  * non-delete version per key" model, and must be invariant to how the
  * event log is split into batches. Hand-rolled property loop with a
  * fixed seed (no scalatest-scalacheck bridge in the offline cache).
  */
case class Ev(pk: String, ts: Long, off: Long, op: String, v: String)

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Event log generator. `ts` is non-decreasing in log (offset) order —
    * the CDC source contract (a key's changes arrive in commit order).
    * Under that contract batch-split invariance must hold; with
    * time-travelling timestamps the reference's last-batch-wins merge
    * (and ours) would legitimately diverge from a global latest-ts rule.
    * `ts = off/3` still forces plenty of equal-ts ties to exercise the
    * tiebreaker.
    */
  def genEvents(rnd: Random): List[Ev] = {
    val n = rnd.nextInt(40)
    List.tabulate(n) { i =>
      Ev(pk = s"p${rnd.nextInt(4)}",
        ts = (i / 3).toLong,
        off = i.toLong,
        op = if (rnd.nextInt(5) == 0) "d" else "u",
        v = s"v${rnd.nextInt(1000)}")
    }
  }

  /** Reference model: per key the event with highest (ts, off); keep it
    * unless it is a delete. */
  def model(evs: List[Ev]): Map[String, String] =
    evs.groupBy(_.pk).flatMap { case (pk, es) =>
      val last = es.maxBy(e => (e.ts, e.off))
      if (last.op == "d") None else Some(pk -> last.v)
    }

  def emptyState = spark.emptyDataset[Ev].toDF().drop("op")

  def run(batches: List[List[Ev]]): Map[String, String] = {
    var state = emptyState
    for (b <- batches if b.nonEmpty) {
      val c = Compaction.latestPerKey(b.toDF(), Seq("pk"), Seq("ts", "off"))
      state = Merge.applyBatch(state, c, Seq("pk"), "op", "d")
    }
    state.select("pk", "v").as[(String, String)].collect().toMap
  }

  test("batched merge equals the naive model; invariant under batch split") {
    val rnd = new Random(42)
    for (iter <- 1 to 25) {
      val evs = genEvents(rnd)
      val whole = run(List(evs))
      assert(whole == model(evs), s"iter $iter: single batch != model")
      if (evs.length >= 2) {
        val cut = 1 + rnd.nextInt(evs.length - 1)
        val (b1, b2) = evs.splitAt(cut)
        assert(run(List(b1, b2)) == whole, s"iter $iter: split at $cut diverged")
        val third = evs.length / 3
        if (third > 0) {
          val s3 = run(List(evs.take(third), evs.slice(third, 2 * third), evs.drop(2 * third)))
          assert(s3 == whole, s"iter $iter: 3-way split diverged")
        }
      }
    }
  }

  test("replaying the same batch is idempotent") {
    val evs = List(Ev("a", 1, 0, "u", "x"), Ev("b", 1, 1, "u", "y"),
      Ev("a", 2, 2, "d", ""), Ev("c", 1, 3, "u", "z"))
    val c = Compaction.latestPerKey(evs.toDF(), Seq("pk"), Seq("ts", "off"))
    val once = Merge.applyBatch(emptyState, c, Seq("pk"), "op", "d")
    val twice = Merge.applyBatch(once, c, Seq("pk"), "op", "d")
    assert(once.select("pk", "v").as[(String, String)].collect().toSet ==
      twice.select("pk", "v").as[(String, String)].collect().toSet)
    assert(once.select("pk", "v").as[(String, String)].collect().toMap ==
      Map("b" -> "y", "c" -> "z")) // a was deleted by its latest event
  }

  test("SCD2 apply: versions close predecessors, deletes close without opening") {
    import org.apache.spark.sql.functions.col
    val schema = Seq.empty[(String, String, Long, Option[Long])]
      .toDF("pk", "v", "valid_from_ms", "valid_to_ms")
    def batch(evs: Ev*) = Compaction.latestPerKey(
      evs.toList.toDF(), Seq("pk"), Seq("ts", "off"))
    // b1: create k1 and k2
    val s1 = Merge.applyBatchScd2(schema,
      batch(Ev("k1", 100, 0, "u", "a1"), Ev("k2", 100, 1, "u", "b1")),
      Seq("pk"), "op", "d", "ts")
    // b2: new version of k1 (k2 untouched)
    val s2 = Merge.applyBatchScd2(s1,
      batch(Ev("k1", 200, 2, "u", "a2")), Seq("pk"), "op", "d", "ts")
    // b3: delete k1
    val s3 = Merge.applyBatchScd2(s2,
      batch(Ev("k1", 300, 3, "d", "")), Seq("pk"), "op", "d", "ts")

    val hist = s3.select("pk", "v", "valid_from_ms", "valid_to_ms")
      .as[(String, String, Long, Option[Long])].collect().toSet
    assert(hist == Set(
      ("k1", "a1", 100L, Some(200L)), // closed by v200
      ("k1", "a2", 200L, Some(300L)), // closed by the delete
      ("k2", "b1", 100L, None)))      // untouched, still current
    // current state = open rows only
    val current = s3.filter(col("valid_to_ms").isNull)
      .select("pk", "v").as[(String, String)].collect().toMap
    assert(current == Map("k2" -> "b1"))
  }
}
