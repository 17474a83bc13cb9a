package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** [[Dedup.exactSpanRewrite]] — the cut semantics the oracle can't
  * isolate: canonical doc untouched, the sharer loses EXACTLY the
  * maximal common byte region (including its boundary spaces — they sit
  * inside duplicated 40-byte windows too), an exact copy rewrites to
  * the empty string, and the byte-accounting invariant holds row-by-row.
  */
class SpanRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // already normalized form (lowercase, single spaces) so the operator's
  // normalization is the identity and expected cuts are byte-exact.
  // Suffixes start with different letters (q/r) and prefixes END with
  // different bytes (...a7a vs ...b7b), so the maximal common region
  // between A and B is exactly ' ' + shared + ' ' (43 bytes >= the
  // 40-byte window).
  val shared = (0 until 13).map(i => s"s$i").mkString(" ") // 41 bytes
  val prefA = (0 until 8).map(i => s"a${i}a").mkString(" ")
  val sufA = (0 until 8).map(i => s"qa$i").mkString(" ")
  val prefB = (0 until 8).map(i => s"b${i}b").mkString(" ")
  val sufB = (0 until 8).map(i => s"rb$i").mkString(" ")
  val docA = s"$prefA $shared $sufA"
  val docB = s"$prefB $shared $sufB"

  test("canonical untouched; sharer loses exactly the common region; copy empties") {
    val docs = Seq((1L, docA), (2L, docB), (3L, docA))
      .toDF("doc_id", "text")
    val out = Dedup.exactSpanRewrite(docs, "doc_id", "text", minLen = 40)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))))
      .toMap
    // A: every window's canonical occurrence is A's own
    assert(out(1L) == ((docA.length.toLong, 0L, 0L, docA.length.toLong,
      md5hex(docA))))
    // B: the interval union of B's redundant windows is the maximal
    // common region ' ' + shared + ' '; surviving text = prefB ++ sufB
    // stitched DIRECTLY (both boundary spaces were duplicated bytes)
    val commonLen = shared.length + 2
    assert(out(2L)._2 == 1L, "one maximal span cut")
    assert(out(2L)._3 == commonLen.toLong, "cut_bytes == |common region|")
    assert(out(2L)._4 == (docB.length - commonLen).toLong)
    assert(out(2L)._5 == md5hex(prefB + sufB))
    // C: exact copy of A -> one maximal span covers the whole doc
    assert(out(3L) == ((docA.length.toLong, 1L, docA.length.toLong, 0L,
      md5hex(""))))
  }

  test("attribution: sharer's span points into the canonical doc; copy points at (canon, 1)") {
    val docs = Seq((1L, docA), (2L, docB), (3L, docA))
      .toDF("doc_id", "text")
    val rows = Dedup.spanAttribution(docs, "doc_id", "text", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(4), r.getInt(5))).sortBy(_._1)
    // A (canonical everywhere) contributes no spans; B's one span leads
    // at its common-region start and points at A's; C's whole-doc span
    // points at (A, 1)
    val pA = prefA.length // common region ' '+shared+' ' starts at pA+1
    assert(rows.map(_._1).toSeq == Seq(2L, 3L))
    val b = rows(0)
    assert(b == ((2L, prefB.length + 1, prefB.length + 1 + shared.length + 2,
      1L, pA + 1)))
    val c = rows(1)
    assert(c == ((3L, 1, docA.length + 1, 1L, 1)))
  }

  test("multibyte corpus: byte accounting exact, canonical untouched, copy empties") {
    // 3-byte CJK chars: windows land mid-char, so the cut boundaries
    // split multibyte sequences — the BINARY stitch must keep byte
    // accounting exact anyway (a string round-trip would mojibake)
    // prefixes end in different bytes (o/a... 'alpha' vs 'bravo' end
    // a/o) and suffixes start differently (o/p), so the maximal common
    // region is exactly ' ' + shared + ' ' = 98 bytes
    val cjkShared = (0x4e00 until 0x4e20).map(_.toChar).mkString // 96 bytes
    val cjkA = "alpha " + cjkShared + " omega"
    val cjkB = "bravo " + cjkShared + " psi"
    val docs = Seq((1L, cjkA), (2L, cjkB), (3L, cjkA)).toDF("doc_id", "text")
    val out = Dedup.exactSpanRewrite(docs, "doc_id", "text", minLen = 40)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    val nA = cjkA.getBytes("UTF-8").length.toLong
    val nB = cjkB.getBytes("UTF-8").length.toLong
    assert(out(1L) == ((nA, 0L, 0L, nA, md5hex(cjkA))), "canonical untouched")
    assert(out(3L)._3 == nA && out(3L)._4 == 0L && out(3L)._5 == md5hex(""),
      "copy rewrites to empty")
    // sharer loses exactly the 98-byte common region; surviving bytes
    // stitch to "bravopsi" (both boundary spaces were duplicated bytes)
    assert(out(2L) == ((nB, 1L, 98L, nB - 98L, md5hex("bravopsi"))))
  }

  test("unique corpus unchanged; invariant clean_bytes == n_bytes - cut_bytes; partition-invariant") {
    val docs = spark.range(60).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(i =>
        concat(lit(s"w$i"), pmod(hash(col("id"), lit(i)), lit(100000))))
        : _*).as("text"))
    val out1 = Dedup.exactSpanRewrite(docs, "doc_id", "text").collect()
    assert(out1.length == 60)
    assert(out1.forall(r => r.getLong(2) == 0L), "no cuts in a unique corpus")
    assert(out1.forall(r => r.getLong(4) == r.getLong(1) - r.getLong(3)))
    val mixed = Seq((1000L, docA), (1001L, docB), (1002L, docA))
      .toDF("doc_id", "text")
    val r1 = Dedup.exactSpanRewrite(mixed, "doc_id", "text")
      .orderBy("id").collect().toSeq
    val r2 = Dedup.exactSpanRewrite(mixed.repartition(7), "doc_id", "text")
      .orderBy("id").collect().toSeq
    assert(r1 == r2, "partitioning must not change the rewrite")
    assert(r1.forall(r => r.getLong(4) == r.getLong(1) - r.getLong(3)))
  }

  test("winnowed rewrite: byte-identical to the every-offset rewrite " +
      "when every duplicated region >= minLen+k-1, at every alignment, " +
      "on a fixture where the CDC anchor rule misses") {
    val win = 40; val k = 15
    // exactly win+k-1 bytes: the guarantee boundary itself
    val span = "qwertyuiopasdfghjklzxcvbnmqwertyuiopasdfghjklzxcvbnmqw"
    assert(span.length == win + k - 1)
    // DISJOINT filler alphabets: the span is the corpus's ONLY
    // duplicated region, so the byte-identity contract applies in full
    def filler(alpha: String, seed: Int, n: Int) =
      (1 to n).map(j => alpha.charAt((seed * 31 + j * 7) % 3)).mkString
    var anchorHits = 0
    for (off <- 0 until 8) {
      val docs = Seq(
        (1L, filler("mno", off, 60 + off) + span + filler("uvw", off + 1, 55)),
        (2L, filler("xyz", off + 2, 90 - off) + span + filler("123", off + 3, 50)),
        (3L, filler("789", off + 5, 120)))
        .toDF("doc_id", "text")
      val exact = Dedup.exactSpanRewrite(docs, "doc_id", "text", win)
        .collect().map(_.toSeq).toSet
      val winn = Dedup.exactSpanRewriteWinnowed(docs, "doc_id", "text",
        win, k).collect().map(_.toSeq).toSet
      assert(winn == exact, s"divergence at alignment $off")
      // sanity: the cut is real (doc 2 loses the span's bytes)
      assert(exact.exists(r => r(0) == 2L && r(3).asInstanceOf[Long] > 0L),
        s"fixture must actually cut at alignment $off")
      if (Dedup.substringDupSpans(docs, "doc_id", "text", win, 8)
          .count() >= 1) anchorHits += 1
    }
    assert(anchorHits < 8,
      "fixture must exhibit an anchor miss for the guarantee contrast")
  }

  test("winnowed rewrite: exact full copy still empties (whole-doc " +
      "region >= the guarantee); sub-guarantee regions keep the " +
      "byte-accounting invariant") {
    // docA is ~100 bytes: the full-copy duplicated region is way past
    // minLen+k-1, so the winnowed route must equal the exact one
    val docs = Seq((1L, docA), (2L, docA)).toDF("doc_id", "text")
    val exact = Dedup.exactSpanRewrite(docs, "doc_id", "text", 40)
      .collect().map(_.toSeq).toSet
    val winn = Dedup.exactSpanRewriteWinnowed(docs, "doc_id", "text", 40, 15)
      .collect().map(_.toSeq).toSet
    assert(winn == exact)
    assert(winn.exists(r => r(0) == 2L && r(5) == md5hex("")),
      "the copy must rewrite to the empty string")
    // A/B share only 43 bytes — inside [minLen, minLen+k-1), where the
    // candidate pass is NOT guaranteed to flag: whatever it decides,
    // the output must stay well-formed (clean_bytes == n_bytes -
    // cut_bytes, canonical semantics when it does cut)
    val sub = Dedup.exactSpanRewriteWinnowed(
      Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"),
      "doc_id", "text", 40, 15).collect()
    sub.foreach { r =>
      assert(r.getLong(4) == r.getLong(1) - r.getLong(3),
        s"invariant broken: $r")
    }
  }

  test("suffix-array pass (prefix doubling) == window-hash pass (fuzz, both minLen parities, ckpt dir)") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    // corpus with planted structure: shared boilerplate headers, full
    // copies, partial copies at random offsets, short docs (< minLen),
    // and pure-random docs; ~80 docs keeps the byte relation small
    // while every code path binds
    val header = "common license header boilerplate shared across many docs "
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def randText(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(10))).mkString(" ")
    val bodies = (0 until 60).map(i => randText(20 + rnd.nextInt(40)))
    val docs = (0 until 60).map { i =>
      val withHeader = if (i % 3 == 0) header + bodies(i) else bodies(i)
      val t =
        if (i % 11 == 7) bodies(i - 1)                        // full copy
        else if (i % 13 == 9) bodies(i - 2).drop(25) + " tail" + i // partial
        else withHeader
      (i.toLong, t)
    } ++ Seq((900L, "short doc"), (901L, ""))
    val df = docs.toDF("doc_id", "text").repartition(7)
    for (minLen <- Seq(32, 40)) { // power-of-two (degenerate pair) and not
      def spans(d: org.apache.spark.sql.DataFrame) = d
        .select(col("id").cast("long"), col("s").cast("long"),
          col("e").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = spans(Dedup.exactDupSpans(df, "doc_id", "text", minLen))
      val got = spans(Dedup.exactDupSpansSA(df, "doc_id", "text", minLen))
      assert(got == want, s"minLen=$minLen: SA diverges — " +
        s"only-SA=${(got -- want).take(3)} only-win=${(want -- got).take(3)}")
      assert(want.nonEmpty, "fixture must actually plant duplicated spans")
    }
    // durable-checkpoint mode: same result, round files cleaned to ≤ 1
    val dir = java.nio.file.Files.createTempDirectory("sa_ckpt").toString
    def spans40(d: org.apache.spark.sql.DataFrame) = d
      .select(col("id").cast("long"), col("s").cast("long"),
        col("e").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got2 = spans40(Dedup.exactDupSpansSA(df, "doc_id", "text", 40,
      checkpointDir = Some(dir)))
    val want2 = spans40(Dedup.exactDupSpans(df, "doc_id", "text", 40))
    assert(got2 == want2)
    val rounds = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("round_"))
    assert(rounds.length <= 1, s"stale round files: ${rounds.toSeq}")
  }
}
