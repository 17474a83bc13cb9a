package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.VectorFunctions

/** [[Dedup.lcpPerPosition]] / [[Dedup.longestDupPerDoc]] /
  * [[Dedup.dupSpectrum]] — the suffix-order LCP statistics, pinned
  * against an all-pairs brute force the oracle can't express: per
  * POSITION (not just per doc), on BYTES (not chars), with cap
  * clamping and partition invariance. Plus the [[graft.functions.BinaryLcp]]
  * primitive itself.
  */
class LcpSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // Already-normalized ASCII docs with a 25-byte shared run (so cap=16
  // clamps), a multibyte pair sharing a run whose BYTE length differs
  // from its char length, a whitespace-only doc (normalizes to empty),
  // and a corpus-unique doc.
  val sharedRun = "the quick brown fox jr" // 22 bytes, appears in docs 1+2
  val docs = Seq(
    1L -> s"aa1 $sharedRun zz1",
    2L -> s"bb2 $sharedRun yy2",
    3L -> "unique pangram vexed wizards", // no long overlap with others
    4L -> "   ", // normalizes to ""
    5L -> "ää öö ää öö xq", // multibyte; "ää öö " repeats within the doc
    6L -> "completely different content")

  /** All-pairs brute force at byte level: ℓ(p) = max over every OTHER
    * suffix of the common-prefix byte length, slices capped at `cap`.
    */
  private def brute(ds: Seq[(Long, String)], cap: Int)
      : Map[(Long, Int), Int] = {
    def norm(s: String) = s.toLowerCase.replaceAll("\\s+", " ").trim
    val bins = ds.map { case (id, t) => id -> norm(t).getBytes("UTF-8") }
    val sufs = for {
      (id, b) <- bins
      p <- 0 until b.length
    } yield (id, p + 1, b.slice(p, math.min(b.length, p + cap)))
    def lcp(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n && a(i) == b(i)) i += 1
      i
    }
    sufs.map { case (id, p, s) =>
      (id, p) -> sufs.iterator
        .filter { case (id2, p2, _) => !(id2 == id && p2 == p) }
        .map(x => lcp(s, x._3)).foldLeft(0)(math.max)
    }.toMap
  }

  test("per-position LCP == all-pairs brute force (bytes, capped)") {
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.lcpPerPosition(df, "doc_id", "text", cap = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val want = brute(docs, 16)
    assert(got == want)
  }

  test("per-doc longest: cap clamps, empty doc 0, every doc present") {
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.longestDupPerDoc(df, "doc_id", "text", cap = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = brute(docs, 16)
    val wantDoc = docs.map { case (id, _) =>
      id -> want.collect { case ((i, _), l) if i == id => l }
        .foldLeft(0)(math.max).toLong
    }.toMap
    assert(got == wantDoc)
    // the shared 24-byte region (" " + 22-byte run + " " — the "aa1"/
    // "bb2" prefixes differ between the docs; maximal common run
    // exceeds cap) clamps to exactly cap for docs 1 and 2
    assert(got(1L) == 16L && got(2L) == 16L)
    assert(got(4L) == 0L, "whitespace-only doc reports 0")
    // multibyte repeat: "ää öö " repeats within doc 5 — byte semantics
    // (each ä/ö is 2 bytes) give the brute-force byte value, not chars
    assert(got(5L) == wantDoc(5L) && got(5L) >= 9L)
  }

  test("spectrum: per-threshold counts, 0-count thresholds kept, bounds checked") {
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.dupSpectrum(df, "doc_id", "text",
        thresholds = Seq(4, 10, 16), cap = 16)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = brute(docs, 16)
    for (th <- Seq(4, 10, 16))
      assert(got(th) == want.valuesIterator.count(_ >= th).toLong, s"th=$th")
    // a threshold nothing reaches still yields a row (left join, 0)
    val none = Dedup.dupSpectrum(df.limit(1), "doc_id", "text",
        thresholds = Seq(16), cap = 16)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(none(16) == 0L)
    // thresholds beyond cap would silently read as ">= cap" — rejected
    intercept[IllegalArgumentException] {
      Dedup.dupSpectrum(df, "doc_id", "text", Seq(40), cap = 16)
    }
  }

  test("partition invariance") {
    val df = docs.toDF("doc_id", "text")
    val one = Dedup.longestDupPerDoc(df.coalesce(1), "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Dedup.longestDupPerDoc(df.repartition(7), "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
  }

  test("suffix-order exact pass == window-hash pass (fuzz, both minLen parities)") {
    val rnd = new scala.util.Random(53)
    val header = "common license header boilerplate shared across many docs "
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def randText(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(10))).mkString(" ")
    val bodies = (0 until 60).map(_ => randText(20 + rnd.nextInt(40)))
    val fuzz = (0 until 60).map { i =>
      val t =
        if (i % 11 == 7) bodies(i - 1)
        else if (i % 13 == 9) bodies(i - 2).drop(25) + " tail" + i
        else if (i % 3 == 0) header + bodies(i)
        else bodies(i)
      (i.toLong, t)
    } ++ Seq((900L, "short doc"), (901L, ""))
    val df = fuzz.toDF("doc_id", "text").repartition(7)
    for (minLen <- Seq(32, 40)) {
      def spans(d: org.apache.spark.sql.DataFrame) = d
        .select(col("id").cast("long"), col("s").cast("long"),
          col("e").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = spans(Dedup.exactDupSpans(df, "doc_id", "text", minLen))
      val got = spans(Dedup.exactDupSpansLcp(df, "doc_id", "text", minLen))
      assert(got == want, s"minLen=$minLen: LCP route diverges — " +
        s"only-lcp=${(got -- want).take(3)} only-win=${(want -- got).take(3)}")
      assert(want.nonEmpty, "fixture must actually plant duplicated spans")
    }
  }

  test("bin_lcp primitive: byte loop, truncation, nulls") {
    VectorFunctions.register(spark)
    def b(s: String) = s.getBytes("UTF-8")
    val rows = Seq(
      (b("abcdef"), b("abcxyz"), 3),
      (b("abc"), b("abcdef"), 3), // shorter operand caps the scan
      (b(""), b("abc"), 0),
      (b("same"), b("same"), 4),
      (b("ä"), b("äx"), 2)) // multibyte: 2 shared BYTES
      .toDF("a", "bb", "want")
    val got = rows.select(VectorFunctions.binLcp(col("a"), col("bb"))
        .as("lcp"), col("want")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    val n = Seq((Option.empty[Array[Byte]], Option(b("x"))))
      .toDF("a", "bb")
      .select(VectorFunctions.binLcp(col("a"), col("bb"))).collect()
    assert(n.head.isNullAt(0), "null operand -> null")
  }
}
