package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Unigram

/** Unigram-LM tokenizer: Viterbi parity vs an independent driver-side
  * reference, seed/EM semantics, fertility card.
  */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Independent reference Viterbi (same contract: min total cost,
    * ties to the longest piece, unknown singles cost `unk`).
    */
  private def refEncode(text: String, vocab: Map[String, Long],
                        unk: Long): Seq[String] = {
    val maxLen = (vocab.keys.map(_.length) ++ Seq(1)).max
    text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
      .filter(_.nonEmpty).toSeq.flatMap { w =>
        val n = w.length
        val dp = Array.fill(n + 1)(Long.MaxValue)
        val bp = new Array[Int](n + 1)
        dp(0) = 0L
        for (i <- 1 to n; len <- 1 to math.min(maxLen, i)) {
          val piece = w.substring(i - len, i)
          val c = vocab.get(piece)
            .orElse(if (len == 1) Some(unk) else None)
          c.foreach { cost =>
            if (dp(i - len) != Long.MaxValue && dp(i - len) + cost <= dp(i)) {
              dp(i) = dp(i - len) + cost; bp(i) = len
            }
          }
        }
        var pos = n
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        while (pos > 0) { acc += w.substring(pos - bp(pos), pos); pos -= bp(pos) }
        acc.reverse.toSeq
      }
  }

  test("native Viterbi encode agrees with the driver reference on " +
      "ties, unknowns, and multi-word text") {
    val vocab = Seq[(String, Long)](
      ("a", 30000L), ("b", 30000L), ("c", 35000L),
      ("ab", 45000L), ("bc", 45000L), ("abc", 80000L),
      ("abcd", 60000L), ("d", 40000L))
    val unk = 200000L
    val cases = Seq(
      "abc",       // dp ties: a+bc = ab+c? 30+45=75 vs 45+35=80 vs abc=80
      "abcd",      // whole-word piece wins
      "abcabc",
      "ax",        // unknown single 'x'
      "xyz",       // all unknown
      "ab abc a",  // multi-word
      "aabbcc", "dcba", "abcdabcd")
    val got = cases.toDF("t")
      .select(Unigram.encode(col("t"), vocab, unk).as("p"))
      .as[Seq[String]].collect()
    cases.zip(got).foreach { case (t, g) =>
      val want = refEncode(t, vocab.toMap, unk)
      assert(g == want, s"encode('$t') = $g, reference $want")
    }
    // the documented tie rule concretely: 'abcd' must be ONE piece
    // (cost 60000) not a+bc+d (30+45+40=115) etc.
    assert(got(1) == Seq("abcd"))
  }

  test("seedVocab: substring counts, top-k cut, singles always kept, " +
      "cost formula exact") {
    val docs = Seq((1L, "ab ab b")).toDF("id", "t")
    // word occurrences: ab, ab, b -> substrings: a(2), b(3), ab(2)
    val v = Unigram.seedVocab(docs, "t", maxPieceLen = 4, maxVocab = 1)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // top-1 by (cnt desc, piece asc) = b(3); singles a, b forced in;
    // ab (not single, not top-1) is cut
    assert(v.keySet == Set("a", "b"), s"got ${v.keySet}")
    val ctot = 2L + 3L
    def cost(c: Long) =
      math.floor(-math.log(c.toDouble / ctot) * 10000 + 0.5).toLong
    assert(v("a") == ((2L, cost(2L))) && v("b") == ((3L, cost(3L))))
  }

  test("emRound: unused pieces prune out, costs re-estimated from " +
      "usage mass") {
    val docs = Seq((1L, "abab abab ab")).toDF("id", "t")
    val seed = Unigram.seedVocab(docs, "t", maxPieceLen = 4, maxVocab = 50)
    // 'abab' and 'ab' are both seeded; Viterbi under seed costs picks
    // the whole-word pieces, so singles a/b get ZERO usage and prune
    val em = Unigram.emRound(docs, "t", seed)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(em.keySet == Set("abab", "ab"), s"got ${em.keySet}")
    assert(em("abab")._1 == 2L && em("ab")._1 == 1L)
    def cost(c: Long) =
      math.floor(-math.log(c.toDouble / 3L) * 10000 + 0.5).toLong
    assert(em("abab")._2 == cost(2L) && em("ab")._2 == cost(1L))
  }

  test("learn: reaches a fixpoint, respects targetVocab + singles " +
      "floor, and never tokenizes worse than the seed") {
    val docs = Seq(
      (1L, "alpha beta alpha beta gamma"),
      (2L, "alphabet alpha beta beta"),
      (3L, "gamma gamma alpha")).toDF("id", "t")
    val learned = Unigram.learn(docs, "t", targetVocab = 8, maxRounds = 6)
    val rows = learned.as[(String, Long, Long)].collect()
    val pieces = rows.map(_._1).toSet
    // singles feasibility floor: every observed char still present
    val chars = "alphabetgamma".toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(pieces), s"missing singles: ${chars.diff(pieces)}")
    // prune bound: at most targetVocab + |singles| pieces
    assert(rows.length <= 8 + chars.size, s"vocab too big: ${rows.length}")
    // fixpoint: more rounds change nothing
    val more = Unigram.learn(docs, "t", targetVocab = 8, maxRounds = 12)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(more == rows.sortBy(_._1).toSeq, "learn did not converge")
    // compression: learned vocabulary never needs MORE pieces than the
    // raw seed on the corpus it was trained on
    def totalPieces(v: org.apache.spark.sql.DataFrame) =
      Unigram.fertility(docs, "id", "t", v)
        .agg(sum(col("n_pieces"))).as[Long].collect().head
    assert(totalPieces(learned) <= totalPieces(Unigram.seedVocab(docs, "t")),
      "learned vocab tokenizes worse than the seed")
  }

  test("learnWithStatus: converged flag distinguishes a fixpoint from " +
      "a maxRounds truncation; learn returns the same table either way") {
    val docs = Seq(
      (1L, "alpha beta alpha beta gamma"),
      (2L, "alphabet alpha beta beta"),
      (3L, "gamma gamma alpha")).toDF("id", "t")
    // generous rounds: must converge, and rounds-used must be honest
    val (vOk, usedOk, convOk) =
      Unigram.learnWithStatus(docs, "t", targetVocab = 8, maxRounds = 12)
    assert(convOk, "expected fixpoint within 12 rounds")
    assert(usedOk <= 12 && usedOk >= 1)
    // one round is not enough on this corpus (the fixpoint needs the
    // prune to settle): the flag must say TRUNCATED, not silently pass
    val (vCut, usedCut, convCut) =
      Unigram.learnWithStatus(docs, "t", targetVocab = 8, maxRounds = 1)
    assert(!convCut && usedCut == 1,
      s"1-round learn must report truncation, got ($usedCut, $convCut)")
    // learn (the status-less form) returns exactly the status form's table
    val viaLearn = Unigram.learn(docs, "t", targetVocab = 8, maxRounds = 1)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaLearn == vCut.as[(String, Long, Long)].collect()
      .sortBy(_._1).toSeq)
    assert(vOk.columns.toSeq == Seq("piece", "cnt", "nat10k"))
  }

  test("k-best sampler: rank-1 == 1-best; k-best costs match a brute-" +
      "force reference; draw is deterministic, seed-sensitive, and " +
      "degenerates at alpha -> inf and k = 1") {
    val vocab = Seq[(String, Long)](
      ("a", 30000L), ("b", 30000L), ("c", 35000L),
      ("ab", 45000L), ("bc", 45000L), ("abc", 80000L),
      ("abcd", 60000L), ("d", 40000L))
    val unk = 200000L
    val vmap = vocab.toMap
    // brute-force all segmentations of a word; sorted cost multiset
    def allCosts(w: String): Seq[Long] = {
      def go(s: String): Seq[Long] =
        if (s.isEmpty) Seq(0L)
        else (1 to math.min(4, s.length)).flatMap { l =>
          val c = vmap.get(s.take(l))
            .orElse(if (l == 1) Some(unk) else None)
          c.toSeq.flatMap(pc => go(s.drop(l)).map(_ + pc))
        }
      go(w).sorted
    }
    val sampler = new graft.functions.UnigramSampler(
      new graft.functions.UnigramTable(
        vocab.map(p => Array(p._1, p._2.toString)).toArray, unk),
      3, 5000L, "s")
    for (w <- Seq("abc", "abcd", "abcabc", "ax", "aabbcc", "dcba")) {
      val kb = sampler.kbestWord(w)
      assert(kb.map(_._1).toSeq == allCosts(w).take(kb.length),
        s"k-best costs for '$w': ${kb.map(_._1).toSeq} vs ${allCosts(w).take(3)}")
      // rank 1 must be the 1-best encode (same cost AND same pieces on
      // this tie-free-by-cost fixture's winners)
      assert(kb(0)._1 == allCosts(w).head)
    }
    // column API: determinism + seed sensitivity + degeneracy
    import spark.implicits._
    val docs = Seq((1L, "abc abc abc abcd ax dcba abcabc aabbcc")).toDF("id", "t")
    def run(nBest: Int, alpha10k: Long, seed: String): Seq[String] =
      docs.select(Unigram.sampleEncode(col("t"), vocab, unk, nBest,
        alpha10k, seed).as("p")).as[Seq[String]].collect().head
    val oneBest = docs.select(Unigram.encode(col("t"), vocab, unk).as("p"))
      .as[Seq[String]].collect().head
    assert(run(3, 5000L, "s") == run(3, 5000L, "s"), "draw must be deterministic")
    assert(run(1, 5000L, "s") == oneBest, "k = 1 must be the 1-best encode")
    assert(run(3, 100000000L, "s") == oneBest,
      "alpha -> inf must collapse to the 1-best encode")
    // alpha = 0 draws uniformly over the n-best: with three 'abc'
    // occurrences and per-occurrence hashes, SOME occurrence must leave
    // the 1-best path on at least one of these seeds (probability of
    // all-rank-1 across seeds is (1/3)^(3*4) — a fixture regression,
    // not chance, if this ever fires)
    val variants = Seq("s1", "s2", "s3", "s4")
      .map(sd => run(3, 0L, sd)).toSet + oneBest
    assert(variants.size > 1, "alpha=0 sampling never left the 1-best path")
  }

  test("fertilitySampled: sampled pieces bounded by the word-level " +
      "k-best envelope; 1-best columns match fertility") {
    val docs = Seq(
      (1L, "alpha beta alpha beta gamma"),
      (2L, "alphabet alpha beta beta"),
      (3L, "")).toDF("id", "t")
    val vocab = Unigram.seedVocab(docs, "t")
    val f1 = Unigram.fertility(docs, "id", "t", vocab)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val fs = Unigram.fertilitySampled(docs, "id", "t", vocab,
        nBest = 3, alpha10k = 0L, seed = "x")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    fs.foreach { case (id, (_, nw, np, nps, fbp, fsbp)) =>
      assert((nw, np, fbp) ==
        ((f1(id)._2, f1(id)._3, f1(id)._4)), s"1-best columns drifted: $id")
      // a sampled segmentation of a word has at least 1 piece and at
      // most len(word) pieces; doc-level: n_words <= sampled <= chars
      if (nw > 0) assert(nps >= nw && fsbp >= 10000L,
        s"sampled fertility below the 1-piece-per-word floor: $id")
      else assert(nps == 0L && fsbp == 0L)
    }
  }

  test("fertility: per-doc pieces/words, zero-word doc reports zeros") {
    val docs = Seq((1L, "abab ab"), (2L, "")).toDF("id", "t")
    val vocab = Unigram.seedVocab(docs, "t")
    val f = Unigram.fertility(docs, "id", "t", vocab)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // both words are single pieces under the seed (whole-word substrings
    // are in the vocab and cheapest)
    assert(f(1L) == ((2L, 2L, 10000L)), s"got ${f(1L)}")
    assert(f(2L) == ((0L, 0L, 0L)))
  }
}
