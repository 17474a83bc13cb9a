package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** kNN label-agreement audit: planted mislabel detection, small-corpus
  * denominators, cell-variant structure, card roll-up.
  */
class LabelAgreementSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Two tight clusters in 4-dim: ids 0-5 hug e1 (label 0), ids 10-15
    * hug e2 (label 1) — except id 5, which sits IN cluster A but
    * carries label 1 (the planted mislabel).
    */
  private def fixture = {
    def a(x: Float, y: Float) = Array(x, y, 0.1f, 0.0f)
    val rows =
      (0 to 4).map(i => (i.toLong, a(1.0f, 0.01f * i), 0)) ++
      Seq((5L, a(1.0f, 0.05f), 1)) ++ // mislabeled: geometrically in A
      (10 to 15).map(i => (i.toLong, a(0.01f * (i - 10), 1.0f), 1))
    rows.toDF("vec_id", "embedding", "label")
  }

  test("exact audit flags the planted mislabel and clears clean points") {
    val e = fixture
    val audit = Similarity.labelAgreement(e, "vec_id", "embedding", "label",
        k = 4, probes = e).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the mislabel: all 4 nearest neighbors are cluster A -> label 0
    assert(audit(5L) == ((0L, 4L, 0L)), s"got ${audit(5L)}")
    // a clean A point at the cluster edge (id 4): its rounded-sim 1.000
    // tie group is {1,2,3,5}, so the mislabeled id 5 is in its top-4 ->
    // 3/4 agreement; the cluster-center point 0 never sees id 5 (it is
    // the 5th-nearest) -> full agreement
    assert(audit(4L)._3 == 7500L, s"got ${audit(4L)}")
    assert(audit(0L)._3 == 10000L)
    // a clean B point: all 4 neighbors labeled 1 -> full agreement
    assert(audit(12L) == ((4L, 4L, 10000L)))
  }

  test("denominator is the actual neighbor count when corpus < k+1") {
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    val audit = Similarity.labelAgreement(tiny, "vec_id", "embedding",
        "label", k = 10, probes = tiny).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // every vector has exactly 2 neighbors; bp over 2, floor div
    assert(audit(1L) == ((1L, 2L, 5000L)))
    assert(audit(3L) == ((0L, 2L, 0L)))
  }

  test("cell variant finds the mislabel without any corpus broadcast") {
    val e = fixture
    // 2 cells seeded by ids 0 (cluster A) and 1 — both in A; cosine
    // assignment still splits: B vectors are near-orthogonal to both
    // seeds, ties resolve deterministically, and within whichever cell
    // id 5 lands its mates are A-labeled
    val audit = Similarity.labelAgreementCells(e, "vec_id", "embedding",
        "label", k = 4, nCells = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(audit(5L) < 2500L, s"mislabel must score low, got ${audit(5L)}")
    assert(audit(12L) > 7500L, s"clean B point must score high")
    // singleton cells are absent, never zero-row division
    val one = Seq((1L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    assert(Similarity.labelAgreementCells(one, "vec_id", "embedding",
      "label", k = 3, nCells = 1).collect().isEmpty)
  }

  test("confusion matrix isolates the mislabel's off-diagonal cell") {
    val conf = Similarity.labelConfusion(fixture, "vec_id", "embedding",
        "label", k = 4, nCells = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // id 5 carries label 1 but its cell-mates are all cluster A ->
    // majority-vote prediction 0: the single (1, 0) cell. id 0 seeds
    // centroid 0 and every other point sits closer to centroid 1
    // (id 1's vector), so id 0 is a singleton cell and absent — 11
    // audited of 12
    assert(conf == Map((0, 0) -> 4L, (1, 0) -> 1L, (1, 1) -> 6L), s"got $conf")
  }

  test("kappa card: exact integer micros, clamps, and negative kappa") {
    import spark.implicits._
    val card = Similarity.labelKappaCard(
      Similarity.labelConfusion(fixture, "vec_id", "embedding",
        "label", k = 4, nCells = 2)).collect().head
    // n=11 (id 0 is a singleton cell), agree=10 -> po = 10e6/11 =
    // 909090 (floor); margins rows (4,7) x cols (5,6) -> rc = 4*5+7*6
    // = 62, pe = 62e6/121 = 512396; kappa = 396694e6 div 487604 = 813557
    assert((card.getLong(0), card.getLong(1), card.getLong(2),
      card.getLong(3), card.getLong(4)) == ((11L, 10L, 909090L, 512396L, 813557L)))
    // degenerate single-class matrix: pe saturates -> clamp to 1e6
    val degen = Similarity.labelKappaCard(
      Seq((0, 0, 10L)).toDF("label", "predicted_label", "n")).collect().head
    assert(degen.getLong(4) == 1000000L)
    // perfectly anti-diagonal: worse than chance, kappa = -1e6 exactly
    // (truncation-toward-zero division agrees across engines)
    val anti = Similarity.labelKappaCard(
      Seq((0, 1, 5L), (1, 0, 5L)).toDF("label", "predicted_label", "n"))
      .collect().head
    assert(anti.getLong(4) == -1000000L)
  }

  test("maxCellPool: loose dial is a no-op, capped still flags mislabel") {
    val e = fixture
    def audit(pool: Int) = Similarity.labelAgreementCells(e, "vec_id",
        "embedding", "label", k = 4, nCells = 2, maxCellPool = pool)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // dial >= max cell size: output identical to the un-dialed run
    val unDialed = Similarity.labelAgreementCells(e, "vec_id", "embedding",
        "label", k = 4, nCells = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(audit(100) == unDialed)
    // capped pool: every queried vector still audited, the planted
    // mislabel still scores low (its pool-mates remain cluster A)
    val capped = audit(4).map(r => (r._1, r._5)).toMap
    // under the suspect line (50%): the 4-member hash pool of id 5's
    // cell can include a label-1 B vector, so 2500 is reachable — the
    // audit signal (suspect vs clean) survives the cap
    assert(capped(5L) < 5000L, s"mislabel must stay low, got ${capped(5L)}")
    assert(capped.keySet.size >= unDialed.size - 1,
      "query side is never restricted by the pool cap")
  }

  test("card rolls up per label with floor-div mean") {
    val e = fixture
    val card = Similarity.labelAgreementCard(
      Similarity.labelAgreement(e, "vec_id", "embedding", "label",
        k = 4, probes = e)).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // label 1 contains the planted mislabel (agreement 0) -> exactly
    // one suspect; label 0's points only lose to id 5's wrong label
    assert(card(1)._3 == 1L, s"one suspect in label 1, got ${card(1)}")
    assert(card(0)._3 == 0L)
    assert(card(0)._1 == 5L && card(1)._1 == 7L)
    // mean is the exact integer floor of the member bps
    val bps = Similarity.labelAgreement(e, "vec_id", "embedding", "label",
        k = 4, probes = e).filter(col("label") === 1).collect()
      .map(_.getLong(4))
    assert(card(1)._2 == bps.sum / bps.length)
  }
}
