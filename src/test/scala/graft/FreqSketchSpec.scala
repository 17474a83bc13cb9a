package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Corpus
import graft.functions.{MgBuffer, VectorFunctions}

/** Misra-Gries heavy-hitters sketch: the undercount bound, heavy-item
  * survival under real pruning (10k distinct >> capacity), partition-
  * invariant candidates-then-recount exactness, and losslessness below
  * capacity.
  */
class FreqSketchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("driver buffer: undercount bound and heavy-item survival") {
    val capacity = 32
    val buf = new MgBuffer(capacity)
    // skewed stream: item h_i appears (20-i)*500 times for i<10 (heavy),
    // plus 10k singletons (the long tail that forces pruning)
    val truth = scala.collection.mutable.Map.empty[String, Long]
    var n = 0L
    for (i <- 0 until 10; _ <- 0 until (20 - i) * 500) {
      buf.add(s"h$i", 1); truth(s"h$i") = truth.getOrElse(s"h$i", 0L) + 1; n += 1
    }
    for (j <- 0 until 10000) { buf.add(s"tail$j", 1); n += 1 }
    buf.prune()
    assert(buf.counts.size <= capacity)
    // every heavy item (true count 5000..10000 > n/capacity ≈ 3500) survives
    for (i <- 0 until 10) {
      assert(buf.counts.containsKey(s"h$i"), s"h$i evicted")
      val est = buf.counts.get(s"h$i")
      assert(est <= truth(s"h$i"), "MG must never overcount")
      assert(truth(s"h$i") - est <= n / capacity,
        s"undercount ${truth(s"h$i") - est} beyond n/capacity ${n / capacity}")
    }
  }

  test("merge: distributed sketch finds the same heavy candidates") {
    import spark.implicits._
    VectorFunctions.register(spark)
    // 40k rows: 8 heavy items (3000..1250 each) + ~23k singleton tail
    val rows = (0 until 8).flatMap(i =>
      Seq.fill(3000 - i * 250)(s"heavy$i")) ++
      (0 until 23000).map(j => s"t$j")
    val df = rows.toDF("item")
    def cands(parts: Int): Set[String] =
      df.repartition(parts)
        .agg(VectorFunctions.freqSketch(col("item"), 64))
        .head.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0)).toSet
    val c1 = cands(1)
    val c13 = cands(13)
    for (i <- 0 until 8) {
      assert(c1.contains(s"heavy$i"), s"heavy$i missing from 1-partition sketch")
      assert(c13.contains(s"heavy$i"), s"heavy$i missing from 13-partition sketch")
    }
    assert(c13.size <= 64)
  }

  test("heavyHitters == exact top-k under real pruning, any partitioning") {
    import spark.implicits._
    val docs = ((0 until 8).flatMap(i => Seq.fill(600 - i * 50)(s"heavy$i")) ++
      (0 until 5000).map(j => s"t$j"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    // k = 8 = the genuinely heavy set: exactness is guaranteed only for
    // items above the N/capacity mass — asking for k=10 here would reach
    // into the count-1 tail, where ANY tied singleton is a valid answer
    val exact = docs.select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count()
      .orderBy(col("count").desc, col("token").asc).limit(8)
      .select("token").as[String].collect().toSeq
    val viaSketch = Corpus.heavyHitters(docs, "text", k = 8, capacity = 64)
      .orderBy("rank").select("token").as[String].collect().toSeq
    assert(viaSketch == exact)
    val repart = Corpus.heavyHitters(docs.repartition(17), "text",
      k = 8, capacity = 64)
      .orderBy("rank").select("token").as[String].collect().toSeq
    assert(repart == exact)
  }

  test("below capacity the sketch is lossless (estimates are exact counts)") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val rows = (0 until 20).flatMap(i => Seq.fill(i + 1)(s"w$i"))
    val sketch = rows.toDF("item").repartition(5)
      .agg(VectorFunctions.freqSketch(col("item"), 512))
      .head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch == (0 until 20).map(i => s"w$i" -> (i + 1).toLong).toMap)
  }
}
