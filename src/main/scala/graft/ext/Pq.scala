package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization (IVF-PQ's compression half): the 100 TB memory
  * path for embedding search. A trained codebook (m sub-codebooks ×
  * nCodes codewords, driver-sized) encodes each vector as m small codes
  * — 8 bytes instead of 256 at (dim=64, m=8) — and asymmetric-distance
  * (ADC) search scores candidates with m table lookups per pair instead
  * of a dim-wide float loop. The decode-free pipeline:
  *
  *   train (Lloyd per subspace, ONE aggregation job per iteration)
  *   → encode (stateless codegen'd projection, stored as the index)
  *   → search (broadcast query tables, ADC scan, top-`refine` shortlist,
  *     exact cosine re-rank via an id fetch-join)
  *
  * Scale shape: the ADC scan carries (id, m bytes) per corpus row — the
  * float vectors stay in the corpus files and are only fetched for the
  * shortlist (refine × queries rows), so the scored relation is ~32×
  * smaller than a brute-force scan. Because the shortlist is re-ranked
  * with EXACT cosine, PQ quantization error can only cost recall, never
  * precision of the reported scores.
  *
  * Vectors are L2-normalized first, making ADC's L2² rank-equivalent to
  * cosine (‖a−b‖² = 2 − 2·cos on unit vectors) — consistent with the
  * cosine-based ANN family ([[Similarity]]).
  */
object Pq {

  /** L2-normalized copy of an embedding column (zero vectors pass
    * through). Evaluates its input twice — bind `emb` as a real
    * attribute first (see [[Dedup.wordShingles]]'s tree-copy warning).
    */
  def normalized(emb: Column): Column = {
    val n2 = aggregate(emb, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    when(n2 > 0.0, transform(emb, x => (x.cast("double") / sqrt(n2)).cast("float")))
      .otherwise(emb)
  }

  /** Train per-subspace Lloyd k-means codebooks. Deterministic init (the
    * lowest-id vectors' subvectors, as in [[Similarity.kmeansCentroids]]).
    * Each iteration is ONE distributed aggregation for ALL m subspaces:
    * assignments come from the codegen'd [[graft.functions.PqCodes]]
    * pass, posexploded to (subspace, code, subvector) and summed by the
    * [[graft.functions.VecSumCount]] vector aggregate — the corpus is
    * scanned, never shuffled (only m·nCodes partial sums move). Empty
    * cells keep their previous codeword.
    *
    * @return books[m][nCodes][dim/m]
    */
  def train(corpus: DataFrame, idCol: String, embCol: String,
            dim: Int, m: Int, nCodes: Int, iters: Int): Array[Array[Array[Float]]] = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    require(nCodes > 0 && nCodes <= 256, "codes must fit one byte")
    VectorFunctions.register(corpus.sparkSession)
    val subDim = dim / m
    // scanned once per iteration: materialize the normalized projection
    val base = Materialize.multiScan(Materialize.spread(corpus)
      .select(col(idCol).as("id"), col(embCol).as("e"))
      .select(col("id"), normalized(col("e")).as("emb")))
    val init = base.orderBy(col("id")).limit(nCodes)
      .select(col("emb")).collect().map(_.getSeq[Float](0).toArray)
    require(init.nonEmpty,
      "Pq.train needs a non-empty corpus to seed its codebooks")
    var books = Array.tabulate(m)(s => Array.tabulate(nCodes)(c =>
      init(c % init.length).slice(s * subDim, (s + 1) * subDim)))
    var iter = 0
    while (iter < iters) {
      val updated = base
        .select(col("emb"), posexplode(VectorFunctions.pqCodes(col("emb"), books)))
        .select(col("pos").as("s"), col("col").as("code"),
          slice(col("emb"), col("pos") * subDim + 1, lit(subDim)).as("sub"))
        .groupBy(col("s"), col("code"))
        .agg(VectorFunctions.vecSumCount(col("sub"), subDim).as("sc"))
        .select(col("s"), col("code"), col("sc.sum"), col("sc.n")).collect()
        .map { r =>
          val sum = r.getSeq[Double](2)
          val n = r.getLong(3).toDouble
          (r.getInt(0), r.getInt(1)) ->
            Array.tabulate(subDim)(j => (sum(j) / n).toFloat)
        }.toMap
      books = Array.tabulate(m)(s => Array.tabulate(nCodes)(c =>
        updated.getOrElse((s, c), books(s)(c))))
      iter += 1
    }
    base.unpersist()
    books
  }

  /** The stored index: (id, code) with `code` = m bytes. */
  def encode(corpus: DataFrame, idCol: String, embCol: String,
             books: Array[Array[Array[Float]]]): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol).as("id"), col(embCol).as("e"))
      .select(col("id"), VectorFunctions.pqEncode(normalized(col("e")), books).as("code"))
  }

  /** Full IVF-PQ: coarse cells prune WHICH vectors are scored, PQ codes
    * shrink WHAT is scored — the standard billion-scale ANN shape. The
    * corpus carries (id, cell, m-byte code); a query probes its `nProbe`
    * nearest coarse cells and ADC-scores only those cells' codes, then
    * the shortlist re-ranks with exact cosine via the id fetch-join.
    * With the corpus written `partitionBy("cell")`
    * ([[Similarity.writeIvfIndex]]), the probe join's cell filter prunes
    * whole partition directories, so a query reads ~nProbe/nCentroids of
    * an index that is itself 32× smaller than the float column.
    *
    * @param cents coarse centroids ((id, vector), e.g.
    *              [[Similarity.kmeansCentroids]] output indexed)
    */
  def searchIvfAdc(corpus: DataFrame, queries: DataFrame, k: Int,
                   cents: Array[(Long, Array[Float])],
                   books: Array[Array[Array[Float]]],
                   nProbe: Int, refine: Int): DataFrame = {
    require(refine >= k, s"refine $refine must be >= k $k")
    VectorFunctions.register(corpus.sparkSession)
    val nCodes = books(0).length
    val codes = corpus.select(col("id").as("nn_id"), col("embedding").as("e"))
      .select(col("nn_id"),
        VectorFunctions.nearestCentroid(col("e"), cents).as("cell"),
        VectorFunctions.pqEncode(normalized(col("e")), books).as("code"))
    // table computed BEFORE the cell explode: projected alongside the
    // Generate it would re-run the O(m·nCodes·subDim) kernel (and ship a
    // table copy) once per probed cell instead of once per query
    val q = queries.select(col("id").as("query_id"), col("embedding").as("qe"))
      .select(col("query_id"),
        VectorFunctions.probeCentroids(col("qe"), cents, nProbe).as("cells"),
        VectorFunctions.pqDistTable(normalized(col("qe")), books).as("tbl"))
      .select(col("query_id"), explode(col("cells")).as("cell"), col("tbl"))
    val shortlist = codes.join(broadcast(q), Seq("cell"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("adist", VectorFunctions.pqAdc(col("code"), col("tbl"), nCodes))
      .withColumn("arank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("adist").asc, col("nn_id").asc)))
      .filter(col("arank") <= refine)
      .select(col("query_id"), col("nn_id"))
    rerank(corpus, queries, shortlist, k)
  }

  private def rerank(corpus: DataFrame, queries: DataFrame,
                     shortlist: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("id").as("nn_id"), col("embedding").as("c_emb"))
    val qe = queries.select(col("id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("nn_id").asc)
    shortlist.join(c, "nn_id").join(broadcast(qe), "query_id")
      .withColumn("sim", round(Similarity.cosine(col("c_emb"), col("q_emb")), 3))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("sim"))
  }

  /** ADC top-k with exact re-rank.
    *
    * @param refine shortlist size per query scored exactly (recall dial:
    *               quantization error only costs recall past `refine`)
    */
  def searchAdc(corpus: DataFrame, queries: DataFrame, k: Int,
                books: Array[Array[Array[Float]]], refine: Int): DataFrame = {
    require(refine >= k, s"refine $refine must be >= k $k")
    VectorFunctions.register(corpus.sparkSession)
    val nCodes = books(0).length
    val codes = encode(corpus, "id", "embedding", books)
      .withColumnRenamed("id", "nn_id")
    val q = queries.select(col("id").as("query_id"), col("embedding").as("qe"))
      .select(col("query_id"),
        VectorFunctions.pqDistTable(normalized(col("qe")), books).as("tbl"))
    // ADC scan: (id, 8-byte code) × broadcast tables; m lookups per pair
    val shortlist = codes.join(broadcast(q), col("nn_id") =!= col("query_id"))
      .withColumn("adist", VectorFunctions.pqAdc(col("code"), col("tbl"), nCodes))
      .withColumn("arank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("adist").asc, col("nn_id").asc)))
      .filter(col("arank") <= refine)
      .select(col("query_id"), col("nn_id"))
    // fetch-join: only shortlist rows (refine × queries) see float vectors
    rerank(corpus, queries, shortlist, k)
  }
}
