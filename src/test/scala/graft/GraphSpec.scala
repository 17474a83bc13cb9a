package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Graph}

/** Similarity-graph analytics: degrees, integer-micro PageRank
  * (bit-checked against an independent in-test simulation of the same
  * recurrence), centrality survivors.
  */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def pairsDf(es: (Long, Long)*) =
    es.toDF("id_a", "id_b").withColumn("jacc", lit(1.0))

  /** Independent reimplementation of the pageRank recurrence on the
    * driver (plain Scala longs): r'(u) = 150000 +
    * (850000 * Σ_{v∼u} (r(v) / deg(v))) / 1e6, floor division
    * throughout. The Spark result must match BIT FOR BIT — that is the
    * integer-determinism contract the oracle replay relies on.
    */
  private def simulate(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = (es ++ es.map(e => (e._2, e._1))).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var r = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters)
      r = adj.keys.map { u =>
        val s = adj(u).map(v => r(v) / deg(v)).sum
        u -> (150000L + (850000L * s) / 1000000L)
      }.toMap
    r
  }

  test("degrees and degree card on a star graph") {
    val p = pairsDf((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val deg = Graph.degrees(p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg == Map(0L -> 4L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    val card = Graph.degreeCard(p).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(card == Map(4L -> 1L, 1L -> 4L))
    // duplicate + reversed pair rows do not double edges
    val noisy = pairsDf((0L, 1L), (1L, 0L), (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    assert(Graph.degrees(noisy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == deg)
  }

  test("pageRank matches the driver-side integer recurrence bit for bit") {
    // star + triangle + isolated pair: hubs, symmetry, and a 2-cycle
    val es = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
    for (iters <- Seq(1, 3, 5)) {
      val got = Graph.pageRank(pairsDf(es: _*), iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == simulate(es, iters), s"iters=$iters")
    }
    val r5 = Graph.pageRank(pairsDf(es: _*), 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // structure: star center above its leaves; leaves identical by
    // symmetry; triangle members identical; 2-cycle at the fixpoint
    // value 1_000_000 (each node forwards its whole rank)
    assert(r5(0L) > r5(1L))
    assert(Set(r5(1L), r5(2L), r5(3L), r5(4L)).size == 1)
    assert(Set(r5(10L), r5(11L), r5(12L)).size == 1)
    assert(r5(20L) == 1000000L && r5(21L) == 1000000L)
  }

  test("pageRankWeighted: uniform weights reduce exactly to pageRank, " +
      "heavier edges pull rank") {
    import org.apache.spark.sql.functions.lit
    val es = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
    // uniform weights: floor((r*w)/(deg*w)) = floor(r/deg) exactly
    val uni = pairsDf(es: _*).withColumn("wbp", lit(7777L))
    val got = Graph.pageRankWeighted(uni, "wbp", iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Graph.pageRank(pairsDf(es: _*), iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == plain)
    // path 1-0-2 where edge (0,1) is 9× heavier than (0,2): node 1
    // receives most of node 0's rank, node 2 starves
    val skewed = Seq((0L, 1L, 9000L), (0L, 2L, 1000L))
      .toDF("id_a", "id_b", "wbp")
    val r = Graph.pageRankWeighted(skewed, "wbp", iters = 5).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) > r(2L), s"heavy edge must outrank: $r")
    // driver-side recurrence bit-check (the oracle-replay contract)
    val adj = Map(0L -> Seq((1L, 9000L), (2L, 1000L)),
      1L -> Seq((0L, 9000L)), 2L -> Seq((0L, 1000L)))
    val wd = adj.view.mapValues(_.map(_._2).sum).toMap
    var sim = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5)
      sim = adj.keys.map { u =>
        val s = adj(u).map { case (v, w) => sim(v) * w / wd(v) }.sum
        u -> (150000L + 850000L * s / 1000000L)
      }.toMap
    assert(r == sim)
  }

  test("pageRankWeighted overflow/positivity guards fail loudly") {
    import org.apache.spark.sql.functions.lit
    // weight 0 violates the >= 1 contract (silent div-by-zero-ish
    // starvation otherwise)
    intercept[IllegalArgumentException] {
      Graph.pageRankWeighted(
        pairsDf((0L, 1L)).withColumn("wbp", lit(0L)), "wbp", iters = 1)
        .collect()
    }
    // a weight that makes rank*weight exceed Long.MaxValue/(n*1e6)
    // must be refused up front, not wrap negative mid-iteration
    intercept[IllegalArgumentException] {
      Graph.pageRankWeighted(
        pairsDf((0L, 1L), (1L, 2L))
          .withColumn("wbp", lit(Long.MaxValue / 1000000L)), "wbp", iters = 1)
        .collect()
    }
    // in-bounds weights still run after the guards
    assert(Graph.pageRankWeighted(
      pairsDf((0L, 1L)).withColumn("wbp", lit(5000L)), "wbp", iters = 1)
      .count() == 2L)
  }

  test("centralSurvivors keeps the hub, min id on rank ties") {
    val p = pairsDf((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (20L, 21L))
    val cc = Dedup.connectedComponents(p)
    val picks = Graph.centralSurvivors(cc, Graph.pageRank(p, 5)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // star cluster (label 0): the center wins on rank; the symmetric
    // 2-cycle (label 20) ties at 1_000_000 -> min id
    assert(picks == Map(0L -> 0L, 20L -> 20L))
  }

  test("triangles: clique, star, and pendant structures count exactly") {
    // K4 clique: C(4,3) = 4 triangles, every node in 3, coef 10000
    val k4 = pairsDf((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(Graph.triangles(k4).count() == 4L)
    val card = Graph.clusteringCard(k4).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(card.values.toSet == Set((3L, 3L, 10000L)))
    // star: zero triangles, hub coef 0, leaves degree-1 -> coef 0
    val star = pairsDf((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    assert(Graph.triangles(star).isEmpty)
    val starCard = Graph.clusteringCard(star).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(starCard(0L) == ((4L, 0L, 0L)))
    assert(starCard(1L) == ((1L, 0L, 0L)))
    // triangle + pendant: the pendant edge joins one triangle node;
    // that node has deg 3, 1 triangle -> coef 2/6 -> 3333 bp (floor)
    val tp = pairsDf((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))
    val tpCard = Graph.clusteringCard(tp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(tpCard(2L) == ((3L, 1L, 3333L)))
    assert(tpCard(0L) == ((2L, 1L, 10000L)))
    assert(tpCard(3L) == ((1L, 0L, 0L)))
    // duplicate + reversed pair rows do not create phantom triangles
    val noisy = pairsDf((0L, 1L), (1L, 0L), (1L, 2L), (0L, 2L), (2L, 0L), (2L, 3L))
    assert(Graph.triangles(noisy).count() == 1L)
  }

  test("graphCard: counts and global transitivity on known shapes") {
    // triangle + pendant: 4 nodes, 4 edges, 1 triangle,
    // wedges = C(2,2)*2... deg = (2,2,3,1) -> sum d(d-1)/2 = (2+2+6+0)/2 = 5
    // global = 3*1/5 -> 6000 bp
    val tp = pairsDf((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))
    val row = Graph.graphCard(tp).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((4L, 4L, 1L, 5L, 6000L)))
    // star: wedges C(4,2)=6, zero triangles -> transitivity 0
    val star = Graph.graphCard(pairsDf((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
      .collect().head
    assert((star.getLong(2), star.getLong(3), star.getLong(4)) == ((0L, 6L, 0L)))
  }

  test("degree-ordered enumeration agrees with id-ordered on the fixture") {
    // the oracle enumerates triangles a<b<c by ID; the Spark side by
    // the (degree, id) orientation — the triangle SET must be identical
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.25)
      .select(col("id_a"), col("id_b")).cache()
    val byDegree = Graph.triangles(pairs).collect()
      .map(r => Set(r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val p = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byId = for {
      (a, b) <- p; (b2, c) <- p
      if b2 == b && p.contains((a, c))
    } yield Set(a, b, c)
    assert(byDegree == byId)
    pairs.unpersist()
  }

  test("kCore: multi-round peel, fixpoint early exit, bounded rounds") {
    // triangle + 2-chain tail (2-3-... wait): 0-1-2 triangle, 2-3, 3-4
    // chain. 2-core: round 1 peels 4 (deg 1), round 2 peels 3 (deg
    // fell to 1) -> triangle remains, every member core_deg 2. The
    // chain forces MULTIPLE rounds (degree cascades).
    val g = pairsDf((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L))
    val core = Graph.kCore(g, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // K4 survives the 3-core intact; its 4-core is empty
    val k4 = pairsDf((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(Graph.kCore(k4, k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    assert(Graph.kCore(k4, k = 4).isEmpty)
    // a long path peels from both ends, one layer per round: with
    // maxRounds too small the BOUNDED intermediate is returned (the
    // defined semantics the oracle unrolls to)
    val path = pairsDf((0L to 8L).sliding(2).map(s => (s(0), s(1))).toSeq: _*)
    assert(Graph.kCore(path, k = 2, maxRounds = 1).count() == 7L,
      "one round peels exactly the two endpoints (ids 0 and 8)")
    assert(Graph.kCore(path, k = 2, maxRounds = 16).isEmpty,
      "a path has no 2-core once rounds suffice")
  }

  test("assortativity: star is maximally disassortative, regular is 0") {
    // star K1,4: directed edges (hub,leaf)x4 + (leaf,hub)x4;
    // x values {4,1}: Pearson r = -1 exactly
    val star = pairsDf((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val s = Graph.assortativityCard(star).collect().head
    assert(s.getLong(0) == 8L)
    assert(s.getDouble(4) == -1.0)
    // triangle: every degree 2 -> zero variance -> defined 0
    val tri = Graph.assortativityCard(pairsDf((0L, 1L), (1L, 2L), (0L, 2L)))
      .collect().head
    assert(tri.getDouble(4) == 0.0)
    // hand-computed mixed shape (triangle + pendant, degrees 2,2,3,1):
    // directed (x,y) list (2,2)x2,(2,3)x2,(3,2)x2,(3,1),(1,3) ->
    // m=8, sx=18, sxy=38, sx2=44;
    // r = (8*38 - 324)/(8*44 - 324) = -20/28 = -0.7143 (round 4)
    val tp = Graph.assortativityCard(
      pairsDf((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L))).collect().head
    assert((tp.getLong(0), tp.getLong(1), tp.getLong(2), tp.getLong(3),
      tp.getDouble(4)) == ((8L, 18L, 38L, 44L, -0.7143)))
  }

  test("graph family runs end-to-end on the fixture pair relation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.25)
    val ranks = Graph.pageRank(pairs, 5)
    val nodes = Graph.degrees(pairs).count()
    assert(ranks.count() == nodes, "one rank per graph node")
    // ranks are positive and the card partitions the node set
    assert(ranks.filter(col("rank_micro") <= 0).isEmpty)
    assert(Graph.degreeCard(pairs).agg(sum("n_nodes")).as[Long].head() == nodes)
    val surv = Graph.centralSurvivors(Dedup.connectedComponents(pairs), ranks)
    assert(surv.count() > 0)
    // exactly one survivor per cluster
    assert(surv.groupBy("cluster").count().filter(col("count") =!= 1).isEmpty)
  }
}
