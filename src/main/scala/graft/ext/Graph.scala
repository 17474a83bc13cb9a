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
    val edges = edgesOf(pairs, idA, idB)
    val deg = Materialize.multiScan(
      edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")))
    var ranks = deg.select(col("id"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      // per-edge contribution r(src) div deg(src), re-keyed on dst:
      // ONE join + ONE aggregation per round, both on the node id
      val contrib = edges
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"),
          expr("rank_micro div deg").as("c"))
      ranks = contrib.groupBy(col("id"))
        .agg(expr("150000 + (850000 * sum(c)) div 1000000")
          .as("rank_micro"))
        .localCheckpoint()
    }
    ranks
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
