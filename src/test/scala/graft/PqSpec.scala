package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.{Pq, Similarity}
import graft.functions.{PqSupport, VectorFunctions}

/** Product quantization: encode determinism and size, ADC identity
  * against the driver-side kernel, and end-to-end recall of ADC search
  * with exact re-rank against brute force.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  val dim = 64; val m = 8; val nCodes = 16

  private def corpus = Tables.table(spark, sf, "embeddings")
    .select(col("vec_id").as("id"), col("embedding"))

  private lazy val books = Pq.train(corpus, "id", "embedding",
    dim, m, nCodes, iters = 2)

  test("codebook geometry and deterministic training") {
    assert(books.length == m)
    assert(books.forall(_.length == nCodes))
    assert(books.forall(_.forall(_.length == dim / m)))
    val again = Pq.train(corpus.repartition(7), "id", "embedding",
      dim, m, nCodes, iters = 2)
    // same data, any partitioning: assignments (integer argmins) agree;
    // centroid means are double sums over the same values — merge-order
    // float drift would show up far below 1e-6
    for (s <- 0 until m; c <- 0 until nCodes; j <- 0 until dim / m)
      assert(math.abs(books(s)(c)(j) - again(s)(c)(j)) < 1e-6f)
  }

  test("codes are m bytes; spark encode agrees with the driver kernel") {
    import spark.implicits._
    val enc = Pq.encode(corpus, "id", "embedding", books)
      .orderBy("id").collect()
    assert(enc.forall(_.getAs[Array[Byte]]("code").length == m))
    // driver-side recompute on the normalized vectors
    val vecs = corpus.select(col("id"), Pq.normalized(col("embedding")).as("e"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    enc.take(50).foreach { r =>
      val expected = PqSupport.encode(books,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vecs(r.getLong(0))))
      assert(r.getAs[Array[Byte]]("code").toSeq == expected.toSeq)
    }
  }

  test("ADC self-distance is the quantization error and beats far vectors") {
    val vecs = corpus.select(col("id"), Pq.normalized(col("embedding")).as("e"))
      .limit(20).collect().map(_.getSeq[Float](1).toArray)
    def ad(a: Array[Float], b: Array[Float]): Double = {
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      PqSupport.adc(nCodes, PqSupport.encode(books, new GenericArrayData(b)),
        PqSupport.distTable(books, new GenericArrayData(a)))
    }
    // a vector's ADC distance to ITSELF is its quantization error —
    // small relative to the ~2.0 expected distance of random unit vectors
    val selfD = vecs.map(v => ad(v, v))
    assert(selfD.forall(d => d >= 0.0 && d < 1.0), s"self ${selfD.max}")
    val crossD = for (i <- vecs.indices; j <- vecs.indices if i != j)
      yield ad(vecs(i), vecs(j))
    assert(selfD.sum / selfD.size < crossD.sum / crossD.size / 2,
      "mean self (quantization) distance must be far below mean cross distance")
  }

  test("IVF-PQ: cell pruning + codes still recall; subset of full-ADC shape") {
    val queries = corpus.filter(col("id") < 5)
    val cents = Similarity.kmeansCentroids(corpus, k = 16, maxIter = 2)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 10)
      .select("query_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIvfPq = Pq.searchIvfAdc(corpus, queries, k = 10, cents, books,
      nProbe = 8, refine = 60)
      .select("query_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIvfPq.size == exact.size)
    // probing half the cells: random 64-dim data has no cluster
    // structure, so cell pruning costs some recall on TRUE neighbors —
    // the dial is nProbe; at nProbe = nCentroids the cells prune nothing
    val recall = exact.count(viaIvfPq.contains).toDouble / exact.size
    assert(recall >= 0.3, s"recall@10 was $recall")
    val allCells = Pq.searchIvfAdc(corpus, queries, k = 10, cents, books,
      nProbe = 16, refine = 60)
      .select("query_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullAdc = Pq.searchAdc(corpus, queries, k = 10, books, refine = 60)
      .select("query_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(allCells == fullAdc,
      "probing every cell must degenerate to the un-pruned ADC search")
  }

  test("ADC + exact re-rank recalls most of the brute-force top-10") {
    val queries = corpus.filter(col("id") < 5)
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 10)
      .select("query_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaPq = Pq.searchAdc(corpus, queries, k = 10, books, refine = 60)
      .select("query_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaPq.size == exact.size)
    val recall = exact.count(viaPq.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 was $recall")
    // every reported sim is an EXACT cosine: re-rank output for a pair
    // must equal the brute-force score when both report it
    val exactSims = Similarity.bruteForceTopK(corpus, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    Pq.searchAdc(corpus, queries, k = 10, books, refine = 60).collect()
      .foreach { r =>
        exactSims.get((r.getLong(0), r.getLong(2)))
          .foreach(s => assert(s == r.getDouble(3)))
      }
  }
}
