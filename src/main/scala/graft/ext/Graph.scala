package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-graph analytics over a near-dup pair relation
  * ((id_a, id_b) as produced by [[Dedup.jaccardPairs]] and friends):
  * degree structure, fixed-iteration PageRank, and centrality-based
  * representative selection.
  *
  * Why a curation pipeline wants this: the pair relation is usually
  * consumed whole by connected components and thrown away, but its
  * SHAPE is diagnostic — a power-law degree tail means a few template
  * documents pair with everything (boilerplate the shingle dials
  * missed), and within a dup cluster the most CENTRAL document (the one
  * similar to most members) is often a better canonical pick than the
  * min-id or the quality-score argmax, which can select an outlier
  * member that happens to score well ([[Dedup.survivors]]'s policy).
  *
  * Determinism: PageRank here is INTEGER-MICRO arithmetic end to end
  * (ranks in millionths, every division a floor `div`) — long sums are
  * associative/commutative, so the result is bit-identical under any
  * partitioning/accumulation order AND exactly replayable by the DuckDB
  * oracle, which a floating-point power iteration cannot guarantee
  * (per-partition accumulation order perturbs low bits; ten iterations
  * compound them). The price is ≤ deg(v) micro truncation per node per
  * round — irrelevant for ranking/representative use.
  *
  * Scale shape: every step is keyed by node id — one shuffle per
  * PageRank round (edges join ranks, re-aggregate on dst), O(iters)
  * rounds with NO driver-side state; degree and the survivor pick are
  * single keyed aggregations. Near-dup graphs are orders of magnitude
  * smaller than the corpus (they are the OUTPUT of a similarity
  * filter), so these run on the reduced relation, never the documents.
  */
object Graph {

  /** Loud long-overflow guard for the integer-micro PageRank
    * recurrences. Rank mass is conserved-or-contracting (Σ r' ≤
    * 150000·n + 0.85·Σ r, started at n·10⁶), so every per-node rank and
    * every per-node Σc is ≤ n·10⁶; the widest intermediate in the plain
    * form is 850000·Σc ≤ 8.5·10¹¹·n, which fits a long iff
    * n ≤ Long.MaxValue/(850000·10⁶) ≈ 1.08·10⁷. Beyond that the sum
    * silently wraps negative, so the bound is ENFORCED here rather than
    * documented — at one extra count() on the already-materialized
    * degree table, paid once per call, not per round. 10⁷ nodes is far
    * beyond any reduced near-dup pair relation; a graph that large
    * should flow through [[Dedup.connectedComponents]]' contraction
    * path, not a micro-exact power iteration.
    */
  private val MaxRankNodes: Long = Long.MaxValue / 850000L / 1000000L

  private def requireRankBound(n: Long): Unit =
    require(n <= MaxRankNodes,
      s"pageRank integer-micro arithmetic overflows a long beyond " +
        s"$MaxRankNodes nodes (got $n): 850000 * sum(contrib) wraps")

  private def edgesOf(pairs: DataFrame, idA: String, idB: String) =
    Materialize.multiScan(
      pairs.select(col(idA).as("src"), col(idB).as("dst"))
        .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst")))
        .distinct())

  /** Per-node degree in the undirected pair graph: (id, degree). */
  def degrees(pairs: DataFrame, idA: String = "id_a",
              idB: String = "id_b"): DataFrame =
    edgesOf(pairs, idA, idB)
      .groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  /** Degree histogram card: (degree, n_nodes) — the one-glance template
    * detector. A healthy near-dup graph is almost all degree 1-2
    * (pairwise copies); a heavy tail is boilerplate mass pairing across
    * the corpus, and its hub nodes are what [[degrees]] then names.
    */
  def degreeCard(pairs: DataFrame, idA: String = "id_a",
                 idB: String = "id_b"): DataFrame =
    degrees(pairs, idA, idB)
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))

  /** Fixed-iteration PageRank on the undirected pair graph, integer
    * micros: r₀ = 1 000 000 per node; each round
    * r'(u) = 150 000 + (850 000 · Σ_{v∼u} (r(v) div deg(v))) div 10⁶
    * (damping 0.85 in micros, every division floor `div` on longs).
    * Every node in the pair relation has degree ≥ 1, so there is no
    * dangling mass. Rounds are localCheckpointed so the final plan does
    * not re-derive the whole iteration chain per downstream consumer.
    *
    * @return (id, rank_micro) — only nodes appearing in `pairs`
    */
  def pageRank(pairs: DataFrame, iters: Int = 5,
               idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges0 = edgesOf(pairs, idA, idB)
    val deg = Materialize.multiScan(
      edges0.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")))
    requireRankBound(deg.count())
    // the source degree is loop-invariant: fold it onto each edge ONCE
    // here instead of re-joining deg inside every round — each round
    // then pays one join + one aggregation, not two joins (r19)
    val edges = Materialize.multiScan(
      edges0.join(deg.withColumnRenamed("id", "src"), Seq("src")))
    var ranks = deg.select(col("id"), lit(1000000L).as("rank_micro"))
    for (i <- 1 to iters) {
      // per-edge contribution r(src) div deg(src), re-keyed on dst:
      // ONE join + ONE aggregation per round, both on the node id
      val contrib = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          expr("rank_micro div deg").as("c"))
      ranks = contrib.groupBy(col("id"))
        .agg(expr("150000 + (850000 * sum(c)) div 1000000")
          .as("rank_micro"))
      // truncate every CheckpointRounds iterations: the chain is linear
      // so plan SIZE grows linearly, but Catalyst analysis of an
      // N-round plan is superlinear in N — unbounded `iters` would pay
      // it on one giant plan. Amortized: one eager job per
      // CheckpointRounds rounds keeps both bounded (r19 ADVICE).
      if (i % CheckpointRounds == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    // checkpoint ONCE after the loop: the iteration chain is LINEAR
    // (each round's plan references the previous exactly once), so the
    // plan grows linearly in rounds and one job materializes all of
    // them — per-round eager checkpoints paid one driver round-trip per
    // iteration for no plan-size benefit (r19). The final checkpoint
    // still protects multi-consumer reads from re-deriving the chain.
    ranks.localCheckpoint()
  }

  /** Plan-truncation cadence for the rank loops: small iteration counts
    * (the declared queries run 5) never checkpoint mid-loop — one
    * post-loop materialization — while a caller passing iters = 50+
    * pays one eager job every 10 rounds instead of superlinear Catalyst
    * analysis on a 50-round plan. */
  private val CheckpointRounds = 10

  /** Triangle enumeration via the degree-ordered "forward" algorithm
    * (Chiba & Nishizeki 1985's edge-orientation idea in the form given
    * by Schank & Wagner 2005): orient every canonical edge from its
    * (degree, id)-SMALLER endpoint to the larger, enumerate wedges only
    * at the smaller endpoint, and close a wedge iff the oriented edge
    * between its two larger nodes exists. Each triangle is produced
    * exactly once (its (degree, id)-minimal vertex owns it), and —
    * the scale point — out-degrees under this orientation are bounded
    * by O(√m), so a hub of degree d contributes O(√m · something)
    * wedges instead of the d² an id-ordered self-join would enumerate
    * at it: the orientation IS the skew defense, pushing hub wedges
    * down to their low-degree neighbors. The closing-edge probe is an
    * equi-join on (node, (degree,id) struct) — no inequality-only join
    * anywhere.
    *
    * @return one row per triangle (id_x, id_y, id_z), x the owning
    *         (degree,id)-minimal vertex
    */
  def triangles(pairs: DataFrame, idA: String = "id_a",
                idB: String = "id_b"): DataFrame = {
    val deg = degrees(pairs, idA, idB)
    // canonicalize BEFORE distinct: a reversed duplicate row (b, a)
    // must not survive as a second copy of the edge
    val canon = pairs.select(least(col(idA), col(idB)).as("a"),
      greatest(col(idA), col(idB)).as("b")).distinct()
    val withDeg = canon
      .join(deg.select(col("id").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("degree").as("db")), Seq("b"))
    val aKey = struct(col("da").as("d"), col("a").as("id"))
    val bKey = struct(col("db").as("d"), col("b").as("id"))
    val fwd = aKey < bKey
    val oriented = Materialize.multiScan(withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("u"),
      when(fwd, bKey).otherwise(aKey).as("v")))
    oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("x"), col("e1.v").as("v1"), col("e2.v").as("v2"))
      .join(oriented.as("e3"),
        col("v1.id") === col("e3.u") && col("v2") === col("e3.v"))
      .select(col("x").as("id_x"), col("v1.id").as("id_y"),
        col("v2.id").as("id_z"))
  }

  /** Per-node triangle counts: (id, n_tri) — nodes in no triangle are
    * absent (join with [[degrees]] via [[clusteringCard]] for zeros).
    */
  def triangleCounts(pairs: DataFrame, idA: String = "id_a",
                     idB: String = "id_b"): DataFrame =
    triangles(pairs, idA, idB)
      .select(explode(array(col("id_x"), col("id_y"), col("id_z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))

  /** Per-node local clustering coefficient card: (id, degree, n_tri,
    * coef_bp) with coef_bp = ⌊10⁴ · 2·tri / (deg·(deg−1))⌋ (0 for
    * degree-1 nodes). The local-structure complement of [[degreeCard]]:
    * a hub with coef_bp near 10⁴ anchors a CLIQUE (one template family,
    * safe to collapse to a single survivor); a hub near 0 is a STAR —
    * a boilerplate fragment pairing with many otherwise-unrelated
    * documents, where collapsing the whole component would destroy
    * distinct content. Integer basis points, oracle-replayable.
    */
  def clusteringCard(pairs: DataFrame, idA: String = "id_a",
                     idB: String = "id_b"): DataFrame =
    degrees(pairs, idA, idB)
      .join(triangleCounts(pairs, idA, idB), Seq("id"), "left")
      .na.fill(0L, Seq("n_tri"))
      .select(col("id"), col("degree"), col("n_tri"),
        when(col("degree") >= 2,
          expr("(10000 * 2 * n_tri) div (degree * (degree - 1))"))
          .otherwise(0L).as("coef_bp"))

  /** One-row whole-graph summary: node/edge/triangle/wedge counts and
    * the global clustering coefficient ⌊10⁴ · 3·triangles / wedges⌋
    * (transitivity). Wedges = Σ C(deg, 2), exact integer (deg·(deg−1)
    * is even). The single-row output is three partial aggregates
    * cross-joined — each SinglePartition sits above a bounded child.
    */
  def graphCard(pairs: DataFrame, idA: String = "id_a",
                idB: String = "id_b"): DataFrame = {
    val p = Materialize.multiScan(
      pairs.select(least(col(idA), col(idB)).as("a"),
        greatest(col(idA), col(idB)).as("b")).distinct())
    val nodes = degrees(p, "a", "b").agg(
      count(lit(1)).as("n_nodes"),
      coalesce(expr("sum(degree * (degree - 1)) div 2"), lit(0L))
        .as("n_wedges"))
    val edges = p.agg(count(lit(1)).as("n_edges"))
    val tris = triangles(p, "a", "b").agg(count(lit(1)).as("n_triangles"))
    nodes.crossJoin(edges).crossJoin(tris)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("n_wedges"),
        when(col("n_wedges") > 0,
          expr("(10000 * 3 * n_triangles) div n_wedges"))
          .otherwise(0L).as("global_coef_bp"))
  }

  /** Weight-proportional PageRank: like [[pageRank]] but each neighbor
    * receives rank in proportion to the EDGE WEIGHT (similarity basis
    * points from the pair relation) instead of 1/deg — a near-dup hub
    * tied to its cluster by J≈0.9 edges outranks one tied by J≈0.25
    * boilerplate overlap, which is exactly the canonical-pick signal
    * [[centralSurvivors]] wants. Same integer-micro discipline:
    * contribution (r(v)·w_vu) div W(v) with W(v)=Σw (long bp sums),
    * floor `div` everywhere, bit-deterministic and oracle-replayable.
    * With uniform weights this reduces EXACTLY to [[pageRank]]
    * (⌊r·w/(deg·w)⌋ = ⌊r/deg⌋ — floors of equal rationals; spec'd).
    * Long bounds are ENFORCED, not documented: the node count must sit
    * under [[MaxRankNodes]] (so 850000·Σc fits, as in [[pageRank]]) and
    * additionally max(w) ≤ Long.MaxValue/(n·10⁶) so the rank·weight
    * product fits — both checked loudly up front from the materialized
    * edge/degree tables instead of wrapping negative mid-iteration.
    *
    * @param weightCol LONG weights > 0 (basis points by convention)
    * @return (id, rank_micro)
    */
  def pageRankWeighted(pairs: DataFrame, weightCol: String, iters: Int = 5,
                       idA: String = "id_a",
                       idB: String = "id_b"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = Materialize.multiScan(
      pairs.select(col(idA).as("src"), col(idB).as("dst"),
          col(weightCol).cast("long").as("w"))
        .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst"),
          col(weightCol).cast("long").as("w")))
        .distinct())
    val wdeg = Materialize.multiScan(
      edges.groupBy(col("src").as("id")).agg(sum(col("w")).as("wd")))
    val n = wdeg.count()
    if (n > 0) {
      requireRankBound(n)
      val b = edges.agg(min(col("w")).as("mn"), max(col("w")).as("mx")).head()
      val (minW, maxW) = (b.getLong(0), b.getLong(1))
      require(minW >= 1L, s"edge weights must be >= 1, got $minW")
      require(maxW <= Long.MaxValue / n / 1000000L,
        s"max edge weight $maxW overflows rank*weight for $n nodes " +
          s"(need <= ${Long.MaxValue / n / 1000000L})")
    }
    // loop-invariant weighted degree folded onto edges once — see
    // [[pageRank]]
    val edgesWd = Materialize.multiScan(
      edges.join(wdeg.withColumnRenamed("id", "src"), Seq("src")))
    var ranks = wdeg.select(col("id"), lit(1000000L).as("rank_micro"))
    for (i <- 1 to iters) {
      val contrib = edgesWd
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          expr("(rank_micro * w) div wd").as("c"))
      ranks = contrib.groupBy(col("id"))
        .agg(expr("150000 + (850000 * sum(c)) div 1000000")
          .as("rank_micro"))
      // bounded-plan cadence — see [[pageRank]]
      if (i % CheckpointRounds == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    // single post-loop checkpoint — see [[pageRank]] (linear chain)
    ranks.localCheckpoint()
  }

  /** Degree-assortativity card (Newman 2002): the Pearson correlation
    * of endpoint degrees over the directed symmetric edge list. The
    * sign is the diagnostic — near-dup graphs from template mass are
    * strongly DISassortative (hubs pair with degree-1 leaves: star
    * shape), while crawl-duplicate families (cliques) sit near 0 from
    * degree-regularity. Symmetry makes Σx = Σy and Σx² = Σy², so
    * r = (m·Σxy − (Σx)²) / (m·Σx² − (Σx)²); every sum is exact long
    * arithmetic (deterministic, oracle-replayable) and only the final
    * ratio is a rounded double. Degree-regular graphs have zero
    * variance — r is defined 0 there (stated, matched by the oracle's
    * CASE). Long overflow bounds m·Σxy at ~9·10¹⁸: safe for any graph
    * with Σdeg² ≲ 3·10⁹ — far beyond a reduced pair relation.
    *
    * @return one row (n_edges_directed, sum_x, sum_xy, sum_x2,
    *         assortativity)
    */
  def assortativityCard(pairs: DataFrame, idA: String = "id_a",
                        idB: String = "id_b"): DataFrame = {
    val e = edgesOf(pairs, idA, idB)
    val deg = degrees(pairs, idA, idB)
    e.join(deg.select(col("id").as("src"), col("degree").as("x")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("degree").as("y")), Seq("dst"))
      .agg(count(lit(1)).as("n_edges_directed"),
        sum(col("x")).as("sum_x"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_x2"))
      .select(col("n_edges_directed"), col("sum_x"), col("sum_xy"),
        col("sum_x2"),
        when(col("n_edges_directed") * col("sum_x2") -
             col("sum_x") * col("sum_x") === 0, lit(0.0))
          .otherwise(round(
            (col("n_edges_directed") * col("sum_xy") -
             col("sum_x") * col("sum_x")).cast("double") /
            (col("n_edges_directed") * col("sum_x2") -
             col("sum_x") * col("sum_x")).cast("double"), 4))
          .as("assortativity"))
  }

  /** k-CORE of the pair graph by bounded-round peeling: repeatedly
    * delete nodes of degree < k (Seidman 1983; the peel is the standard
    * sequential algorithm's set-parallel form — deleting ALL sub-k
    * nodes of a round at once reaches the same fixpoint, since removal
    * only ever lowers degrees). The 2-core is the curation read:
    * pendant and chain structure (one-off pairwise copies) peels away,
    * what remains is CYCLIC template mass — the boilerplate families
    * worth a dedicated rule rather than pairwise dedup.
    *
    * Semantics are "peel at most `maxRounds` rounds, stop early at the
    * fixpoint" — defined this way so the DuckDB oracle (which unrolls
    * exactly `maxRounds` rounds) computes the SAME relation whether or
    * not the graph converges: peeling is idempotent at the fixpoint, so
    * extra unrolled rounds are no-ops, and if the bound binds first
    * both sides stop at the identical intermediate. Each round is one
    * keyed aggregate + two id-keyed semi-joins, localCheckpointed to
    * keep the plan tree flat; the fixpoint probe costs one count per
    * round (bounded driver work, O(maxRounds) actions total).
    *
    * @return (id, core_deg) — surviving nodes with their degree inside
    *         the peeled subgraph
    */
  def kCore(pairs: DataFrame, k: Int, maxRounds: Int = 16,
            idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var edges = edgesOf(pairs, idA, idB)
    var round = 0
    var removed = 1L
    while (round < maxRounds && removed > 0) {
      val deg = Materialize.multiScan(
        edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
      removed = deg.filter(col("deg") < k).count()
      if (removed > 0) {
        val keep = deg.filter(col("deg") >= k).select(col("src"))
        edges = edges
          .join(keep, Seq("src"))
          .join(keep.withColumnRenamed("src", "dst"), Seq("dst"))
          .select(col("src"), col("dst")).localCheckpoint()
      }
      deg.unpersist()
      round += 1
    }
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("core_deg"))
  }

  /** Centrality-based canonical pick: per cluster keep the member with
    * the highest PageRank (min id on ties) — the "most representative"
    * policy, vs [[Dedup.survivors]]'s external quality-score argmax.
    *
    * @param clusters (id, cluster) as from [[Dedup.connectedComponents]]
    * @param ranks    (id, rank_micro) as from [[pageRank]]
    * @return (cluster, keep_id, rank_micro)
    */
  def centralSurvivors(clusters: DataFrame, ranks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("rank_micro").desc, col("id").asc)
    clusters.join(ranks, Seq("id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("id").as("keep_id"), col("rank_micro"))
  }
}
