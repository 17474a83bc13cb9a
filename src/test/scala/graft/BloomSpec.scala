package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Corpus
import graft.functions.{Bloom, VectorFunctions}

/** Bloom sketch: no false negatives, bounded false positives, bit-exact
  * determinism under repartitioning, codegen/interpreted agreement, and
  * the decontamination guarantee — the prefilter NEVER changes results,
  * even when deliberately undersized.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  val nBits = 1 << 16
  val k = 5

  test("no false negatives; FPR near theory; merge is partition-invariant") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val keys = (1L to 4000L).map(i => i * 0x9e3779b97f4a7c15L + 17L)
    def build(parts: Int): Array[Byte] =
      keys.toDF("h").repartition(parts)
        .agg(VectorFunctions.bloomAgg(col("h"), nBits, k))
        .head.getAs[Array[Byte]](0)
    val one = build(1)
    val many = build(13)
    assert(java.util.Arrays.equals(one, many),
      "same key set must give a bit-identical filter at any partitioning")
    val words = Bloom.toWords(one)
    assert(keys.forall(Bloom.contains(words, nBits, k, _)),
      "bloom filters cannot have false negatives")
    // theory: fpr = (1 - e^(-k n / m))^k ; n=4000, m=65536 -> ~2.1%
    val probes = (1L to 20000L).map(i => i * 0x5851f42d4c957f2dL + 3L)
      .filterNot(keys.contains)
    val fpr = probes.count(Bloom.contains(words, nBits, k, _)).toDouble / probes.size
    val theory = math.pow(1 - math.exp(-k.toDouble * keys.size / nBits), k)
    assert(fpr < theory * 2 + 0.01, s"fpr $fpr vs theory $theory")
  }

  test("codegen probe agrees with the driver-side implementation") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val keys = (1L to 500L).map(Bloom.mix)
    val filter = keys.toDF("h")
      .agg(VectorFunctions.bloomAgg(col("h"), nBits, k))
      .head.getAs[Array[Byte]](0)
    val words = Bloom.toWords(filter)
    val probes = (1L to 3000L).map(i => Bloom.mix(i + 7777L))
    val viaSpark = probes.toDF("h")
      .withColumn("hit", VectorFunctions.bloomContains(col("h"), filter, nBits, k))
      .orderBy("h").select("hit").as[Boolean].collect()
    val viaDriver = probes.sorted.map(Bloom.contains(words, nBits, k, _))
    assert(viaSpark.toSeq == viaDriver.toSeq)
  }

  test("bloom decontamination == exact, even with an undersized filter") {
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = rows(Corpus.decontaminate(corpus, bench, "doc_id", "text", n = 5))
    val bloom = rows(Corpus.decontaminateBloom(corpus, bench, "doc_id", "text",
      n = 5, nBits = 1 << 18, k = 5))
    assert(bloom == exact)
    // 64 bits for thousands of shingles: the filter is saturated (every
    // probe hits) — the exact verify must still strip every false positive
    val saturated = rows(Corpus.decontaminateBloom(corpus, bench, "doc_id", "text",
      n = 5, nBits = 64, k = 2))
    assert(saturated == exact,
      "a saturated prefilter must not change results, only lose pruning")
  }

  test("broadcast probe == literal probe on a >=64 MB filter; registry released") {
    import spark.implicits._
    import graft.functions.BloomBroadcasts
    VectorFunctions.register(spark)
    // 2^29 bits = 64 MiB of words — the GB-scale form's shape, at the
    // smallest size the switch would route to the broadcast path
    val bigBits = 1 << 29
    val members = (1L to 100000L).map(i => Bloom.mix(i * 31L + 5L))
    val words = new Array[Long](Bloom.nWords(bigBits))
    members.foreach(Bloom.add(words, bigBits, k, _))
    val bytes = Bloom.toBytes(words)
    assert(bytes.length >= (64 << 20))
    val bcast = spark.sparkContext.broadcast(words)
    val before = BloomBroadcasts.size
    val handle = BloomBroadcasts.put(bcast)
    val probes = members.take(2000) ++ (1L to 2000L).map(i => Bloom.mix(i - 999999L))
    // both probe forms over the same rows: identical by construction
    val df = probes.toDF("h").repartition(2)
      .withColumn("lit_hit", VectorFunctions.bloomContains(col("h"), bytes, bigBits, k))
      .withColumn("bc_hit", VectorFunctions.bloomContainsBroadcast(col("h"), handle, bigBits, k))
    // Dataset construction analyzed the plan (handle resolved into an
    // embedded Broadcast): the registry entry can be dropped BEFORE the
    // action — the lifecycle decontaminateBloom relies on
    BloomBroadcasts.remove(handle)
    assert(BloomBroadcasts.size == before, "registry entry must be released")
    val rows = df.select("h", "lit_hit", "bc_hit").collect()
    assert(rows.length == probes.length)
    rows.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2),
        s"paths disagree on key ${r.getLong(0)}")
    }
    val memberSet = members.take(2000).toSet
    rows.filter(r => memberSet(r.getLong(0))).foreach { r =>
      assert(r.getBoolean(2), "broadcast probe lost a member (false negative)")
    }
    bcast.unpersist(blocking = true)
  }

  test("decontaminateBloom size switch: broadcast path gives identical results") {
    import graft.functions.BloomBroadcasts
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaLiteral = rows(Corpus.decontaminateBloom(
      corpus, bench, "doc_id", "text", n = 5, nBits = 1 << 18, k = 5))
    // broadcastBytes = 0 forces every filter over the switch — the
    // production dispatch for >16 MB filters, exercised end-to-end
    val before = BloomBroadcasts.size
    val viaBroadcast = rows(Corpus.decontaminateBloom(
      corpus, bench, "doc_id", "text", n = 5, nBits = 1 << 18, k = 5,
      broadcastBytes = 0L))
    assert(viaBroadcast == viaLiteral)
    assert(BloomBroadcasts.size == before,
      "decontaminateBloom must release its registry handle")
    spark.catalog.clearCache()
  }

  test("probing with a different nBits than the build is rejected") {
    import spark.implicits._
    VectorFunctions.register(spark)
    val filter = Seq(1L, 2L, 3L).toDF("h")
      .agg(VectorFunctions.bloomAgg(col("h"), nBits, k))
      .head.getAs[Array[Byte]](0)
    // smaller nBits would stay in bounds but probe wrong bit positions —
    // silent false negatives; the builder must refuse both directions
    val e = intercept[Exception] {
      Seq(1L).toDF("h")
        .select(VectorFunctions.bloomContains(col("h"), filter, nBits / 2, k))
        .collect()
    }
    assert(e.getMessage.contains("does not match the filter"))
  }

  test("prefilter runs below the exact join (plan shape)") {
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val plan = Corpus.decontaminateBloom(corpus, bench, "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    val filterIdx = plan.indexOf("bloom_contains")
    val joinIdx = plan.indexOf("LeftSemi")
    assert(filterIdx >= 0, "bloom_contains must appear in the physical plan")
    assert(joinIdx >= 0 && joinIdx < filterIdx,
      "the bloom prune must sit BELOW the semi join (inside the scan side)")
  }
}
