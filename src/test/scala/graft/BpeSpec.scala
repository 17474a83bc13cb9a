package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.{Bpe, Corpus}

/** Merge-table BPE: learning must reproduce the textbook greedy trace
  * (Sennrich et al.'s low/lower/newest/widest example), encoding must
  * apply the table deterministically, and the native expression must be
  * byte-identical to the builtin chained-replace form.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // the classic corpus: low×5, lower×2, newest×6, widest×3
  private def classicCorpus = Seq(
    (1L, ("low " * 5).trim),
    (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim),
    (4L, ("widest " * 3).trim)).toDF("doc_id", "text")

  test("learn reproduces the hand-computed greedy merge sequence") {
    val merges = Bpe.learn(classicCorpus, "text", nMerges = 5)
    // round-by-round: (e,s) 9 beats (s,t) 9 lexicographically; then
    // (es,t) 9; (l,o) 7 beats (o,w) 7; (lo,w) 7; (e,w) 6 wins the
    // 6-way tie against (n,e) and (w,est)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w"), ("e", "w")), merges.toString)
  }

  test("driver fast path and distributed learning produce the same table") {
    // driverVocabLimit = 0 forces the distributed per-round loop (the
    // q_bpe_learn oracle's semantics); the default takes the collected
    // in-memory learner — they must agree rule for rule
    val viaDriver = Bpe.learn(classicCorpus, "text", nMerges = 5)
    val viaSpark = Bpe.learn(classicCorpus, "text", nMerges = 5,
      driverVocabLimit = 0L)
    assert(viaDriver == viaSpark, s"$viaDriver vs $viaSpark")
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val d2 = Bpe.learn(docs, "text", nMerges = 8)
    val s2 = Bpe.learn(docs, "text", nMerges = 8, driverVocabLimit = 0L)
    assert(d2 == s2, s"fixture-corpus parity: $d2 vs $s2")
  }

  test("encode applies merges in rank order; unseen word composes") {
    val merges = Bpe.learn(classicCorpus, "text", nMerges = 5)
    // "lowest" is NOT in the corpus: l,o,w,e,s,t -> es -> est -> lo ->
    // low -> [low, est]
    val out = Seq((1L, "lowest")).toDF("id", "text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .as[Seq[String]].head()
    assert(out == Seq("low", "est"), out.toString)
    // multi-word + punctuation: words encode independently
    val multi = Seq((1L, "lowest newest, low!")).toDF("id", "text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .as[Seq[String]].head()
    assert(multi == Seq("low", "est", "n", "ew", "est", ",", "low", "!"),
      multi.toString)
  }

  test("native bpe_encode is identical to the builtin replace chain") {
    val merges = Bpe.learn(classicCorpus, "text", nMerges = 5)
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val cmp = docs.select(
        Bpe.encode(col("text"), merges).as("a"),
        Bpe.encodeNative(col("text"), merges).as("b"))
      .filter(not(col("a") === col("b")))
    assert(cmp.isEmpty, s"paths diverge: ${cmp.take(3).mkString("; ")}")
    // and on the classic corpus + the unseen word
    val probe = Seq((1L, "lowest newest widest wines")).toDF("id", "text")
      .select(Bpe.encode(col("text"), merges).as("a"),
        Bpe.encodeNative(col("text"), merges).as("b"))
      .as[(Seq[String], Seq[String])].head()
    assert(probe._1 == probe._2, probe.toString)
  }

  test("native==builtin encode parity fuzz on dense random corpora") {
    // a 6-letter alphabet makes merge tables DENSE (many overlapping
    // pairs, the dual-split-collision-prone regime the scaladoc
    // documents) — the two formulations must still agree everywhere,
    // including on words the learner never saw
    val rnd = new scala.util.Random(123)
    (0 until 3).foreach { trial =>
      val letters = "abcdef"
      def word(): String = (0 until 2 + rnd.nextInt(6))
        .map(_ => letters(rnd.nextInt(letters.length))).mkString
      val df = (0 until 120)
        .map(i => (i.toLong, (0 until 8).map(_ => word()).mkString(" ")))
        .toDF("doc_id", "text")
      val probes = (0 until 40)
        .map(i => (1000L + i, (0 until 6).map(_ => word()).mkString(" ")))
        .toDF("doc_id", "text")
      val merges = Bpe.learn(df, "text", nMerges = 12)
      val diff = df.unionByName(probes)
        .select(Bpe.encode(col("text"), merges).as("a"),
          Bpe.encodeNative(col("text"), merges).as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(diff == 0L, s"trial $trial diverged under table $merges")
    }
  }

  test("encode is safe on non-ASCII and on the wrap char itself") {
    val merges = Seq(("e", "s"), ("es", "t"))
    // non-Latin letters pre-tokenize per character (single-char words
    // never merge); the U+001F wrap char is stripped from input so a
    // hostile document cannot forge a symbol boundary
    val out = Seq((1L, "tests café 你好 test"))
      .toDF("id", "text")
      .select(Bpe.encode(col("text"), merges).as("toks"))
      .as[Seq[String]].head()
    // "tests" -> t,est,s ; "café" -> caf + é ; CJK chars single;
    // "test" -> stripped to "test" -> t,est
    assert(out == Seq("t", "est", "s", "c", "a", "f", "é",
      "你", "好", "t", "est"), out.toString)
    val native = Seq((1L, "tests café 你好 test"))
      .toDF("id", "text")
      .select(Bpe.encodeNative(col("text"), merges).as("toks"))
      .as[Seq[String]].head()
    assert(native == out, s"native $native vs builtin $out")
  }

  test("tokenCount plugs into pack as the budget counter") {
    val merges = Bpe.learn(classicCorpus, "text", nMerges = 5)
    val docs = Seq((1L, "low low"), (2L, "lowest"), (3L, "newest newest"))
      .toDF("doc_id", "text")
    // BPE counts: doc1 = 2 (low,low), doc2 = 2 (low,est),
    // doc3 = 6 (n,ew,est twice)
    val counts = docs.select(col("doc_id"),
        Bpe.tokenCount(col("text"), merges).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(counts == Map(1L -> 2, 2L -> 2, 3L -> 6), counts.toString)
    val packed = Corpus.pack(docs, "doc_id", "text", budget = 4,
        tokenCounter = c => Bpe.tokenCount(c, merges))
      .select(col("id"), col("pack_id")).as[(Long, Long)].collect().toMap
    // cumulative BPE tokens: 2, 4, 10 -> starts 0, 2, 4 -> packs 0, 0, 1
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 1L), packed.toString)
  }
}
