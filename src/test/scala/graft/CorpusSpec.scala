package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.Corpus

class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("mixture sample: per-stratum rates, nesting, zero default") {
    val docs = (0L until 3000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    def ids(pcts: Map[String, Int], dflt: Int = 0): Map[String, Set[Long]] =
      Corpus.mixtureSample(docs, "source", Seq("doc_id"), pcts, dflt)
        .as[(Long, String)].collect().groupBy(_._2).view
        .mapValues(_.map(_._1).toSet).toMap
    val mix = ids(Map("src0" -> 60, "src1" -> 20))
    // rates hit within hash noise (1000 rows/stratum, ±6%)
    assert(math.abs(mix("src0").size - 600) < 60, s"src0 ${mix("src0").size}")
    assert(math.abs(mix("src1").size - 200) < 60, s"src1 ${mix("src1").size}")
    assert(!mix.contains("src2"), "default 0 must drop unlisted strata")
    // nesting: a lower rate selects a SUBSET (same hash threshold family)
    val tighter = ids(Map("src0" -> 20))
    assert(tighter("src0").subsetOf(mix("src0")))
  }

  test("unigram surprisal: matches the formula; rare-token docs score higher") {
    val docs = Seq(
      (1L, "a a a a"), // 4 of the commonest token
      (2L, "a a rare1 rare2")) // half rare singletons
      .toDF("doc_id", "text")
    val out = Corpus.unigramSurprisal(docs, "doc_id", "text")
      .select("id", "n_tok", "surprisal_x10k", "mean_surprisal_x10k")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // corpus: a×6, rare1×1, rare2×1, total 8
    def nat10k(cnt: Long): Long =
      math.floor(-math.log(cnt.toDouble / 8) * 10000 + 0.5).toLong
    val expected1 = 4 * nat10k(6)
    val expected2 = 2 * nat10k(6) + 2 * nat10k(1)
    assert(out(1L) == ((4L, expected1, expected1 / 4)))
    assert(out(2L) == ((4L, expected2, expected2 / 4)))
    assert(out(2L)._3 > out(1L)._3,
      "the rare-token doc must carry higher mean surprisal")
  }

  test("bigram surprisal: matches the conditional formula; repetition scores low") {
    val docs = Seq(
      (1L, "x x x x x"),     // one dominant bigram, repeated
      (2L, "x y z x q"),     // rare continuations
      (3L, "solo"),          // <2 tokens: no bigrams, must drop out
      (4L, "")).toDF("doc_id", "text")
    val out = Corpus.bigramSurprisal(docs, "doc_id", "text")
      .select("id", "n_bigrams", "surprisal_x10k", "mean_surprisal_x10k")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out.keySet == Set(1L, 2L))
    // corpus bigrams: (x,x)=4, (x,y)=1, (y,z)=1, (z,x)=1, (x,q)=1
    // contexts: x -> 6, y -> 1, z -> 1
    def nat10k(p: Double): Long = math.floor(-math.log(p) * 10000 + 0.5).toLong
    val d1 = 4 * nat10k(4.0 / 6)
    val d2 = nat10k(1.0 / 6) + nat10k(1.0) + nat10k(1.0) + nat10k(1.0 / 6)
    assert(out(1L) == ((4L, d1, d1 / 4)))
    assert(out(2L) == ((4L, d2, d2 / 4)))
    assert(out(1L)._3 < out(2L)._3,
      "the repetitive doc must carry lower mean bigram surprisal")
  }

  test("stupid backoff: the ladder fires at every level with exact scores") {
    // tri (a,b,c)=2 -> level 3; (b,c,d)=1 but bigram (c,d)=2 -> level 2;
    // the rest are singleton trigrams over singleton bigrams -> level 1.
    // <3-token docs drop out.
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w"),
      (4L, "c d q"), (5L, "z")).toDF("doc_id", "text")
    val out = Corpus.backoffSurprisal(docs, "doc_id", "text")
      .select("id", "n_trigrams", "n_tri_hits", "n_bi_backoff",
        "n_uni_backoff", "surprisal_x10k")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5), r._6)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L)._1 == ((2L, 1L, 1L, 0L)), out(1L).toString)
    assert(out(2L)._1 == ((2L, 1L, 0L, 1L)), out(2L).toString)
    assert(out(3L)._1 == ((2L, 0L, 0L, 2L)), out(3L).toString)
    assert(out(4L)._1 == ((1L, 0L, 0L, 1L)), out(4L).toString)
    def nat10k(s: Double): Long = math.floor(-math.log(s) * 10000 + 0.5).toLong
    // doc1: (a,b,c) lvl3 S = 2/c(a,b)=2/2 = 1 -> 0 nats;
    //       (b,c,d) lvl2 S = 0.4·c(c,d)/c(c) = 0.4·2/3
    assert(out(1L)._2 == nat10k(1.0) + nat10k(0.4 * 2 / 3), out(1L).toString)
    // doc2: (a,b,c) lvl3 0 nats; (b,c,e) lvl1 S = 0.16·c(e)/N = 0.16/16
    // (N counts doc5's lone token too — unigram totals see every doc,
    // even ones too short to score)
    assert(out(2L)._2 == nat10k(0.16 * 1 / 16), out(2L).toString)
  }

  test("qualityScore: hashed unigram+bigram features, exact integer logits") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
    // uniform +1 weights make the logit = the feature count, so the
    // feature extraction is pinned exactly without hand-computing md5
    val ones = spark.range(64).select(col("id").as("bucket"), lit(1L).as("w"))
    val out = Corpus.qualityScore(docs, "doc_id", "text", ones,
        nBuckets = 64, thrMilli = 500L)
      .select("id", "n_features", "logit", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc1: 3 unigrams + 2 bigrams; mean 1 >= 0.5 -> keep
    assert(out(1L) == ((5L, 5L, true)), out.toString)
    // doc2: single token, no bigram branch (the sequence() guard)
    assert(out(2L) == ((1L, 1L, true)), out.toString)
    // doc3: no tokens, no features -> drops out
    assert(!out.contains(3L))
    // buckets absent from the table weigh 0; verdict is mean-based
    val empty = spark.range(0).select(col("id").as("bucket"), col("id").as("w"))
    val zeroed = Corpus.qualityScore(docs, "doc_id", "text", empty,
        nBuckets = 64, thrMilli = 1L)
      .select("id", "logit", "keep").as[(Long, Long, Boolean)].collect()
    assert(zeroed.forall(r => r._2 == 0L && !r._3), zeroed.toSeq.toString)
    // the weight lookup must be a broadcast join, not per-bucket exprs
    val plan = Corpus.qualityScore(docs, "doc_id", "text", ones, 64, 0L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("dsirScore ranks target-like documents above off-distribution ones") {
    val raw = Seq(
      (1L, "alpha beta alpha beta"),  // pure target vocabulary
      (2L, "zeta omega zeta omega"),  // pure off-distribution
      (3L, "alpha beta zeta omega"),  // mixed
      (4L, "")).toDF("doc_id", "text") // no tokens: drops out
    val target = Seq((100L, "alpha beta alpha beta alpha"))
      .toDF("doc_id", "text")
    val out = Corpus.dsirScore(raw, target, "doc_id", "text", nBuckets = 256)
      .select("id", "n_features", "dsir_x10k")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // 4 unigrams + 3 bigrams per 4-token doc
    assert(out.values.forall(_._1 == 7L), out.toString)
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2,
      s"target-likeness must order 1 > 3 > 2: $out")
    // off-distribution features (never seen by the target) carry the
    // full smoothed penalty: the pure off-distribution doc sits far
    // below the pure target-like one (absolute signs depend on the
    // smoothing prior at this tiny N — only ratios are meaningful)
    assert(out(2L)._2 < out(1L)._2 - 50000L, out.toString)
    // the λ table must ride as a broadcast, not shuffle the features
    val plan = Corpus.dsirScore(raw, target, "doc_id", "text", 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("gopherRules: each rule fails on exactly its target pathology") {
    def doc(parts: Seq[String]): String = parts.mkString(" ")
    val base = Seq("the", "of") ++ Seq.fill(58)("word")
    val docs = Seq(
      (1L, doc(base)),                                    // clean: keep
      (2L, doc(Seq("the", "of", "word", "word", "word"))), // too short
      (3L, doc(Seq("the", "of") ++ Seq.fill(58)("x" * 20))), // words too long
      (4L, doc(Seq("the", "of") ++ Seq.fill(48)("word") ++ Seq.fill(10)("#"))), // symbol-heavy
      (5L, doc(Seq("the", "of") ++ Seq.fill(38)("word") ++ Seq.fill(20)("123"))), // non-alpha words
      (6L, doc(Seq.fill(60)("word"))))                    // no function words
      .toDF("doc_id", "text")
    val out = Corpus.gopherRules(docs, "doc_id", "text")
      .select("id", "r_wordcount", "r_meanlen", "r_symbol", "r_alpha",
        "r_stopwords", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(out(1L) == ((true, true, true, true, true, true)), out(1L).toString)
    assert(out(2L) == ((false, true, true, true, true, false)), out(2L).toString)
    assert(out(3L) == ((true, false, true, true, true, false)), out(3L).toString)
    assert(out(4L) == ((true, true, false, true, true, false)), out(4L).toString)
    assert(out(5L) == ((true, true, true, false, true, false)), out(5L).toString)
    assert(out(6L) == ((true, true, true, true, false, false)), out(6L).toString)
  }

  test("repetitionSignals: each repetition mode trips exactly its signal") {
    // the parquet fixture is single-line, so the line/para modes are
    // exercised here with crafted multi-line docs; values hand-computed
    val docs = Seq(
      // clean: 30 distinct 3-char words over 2 distinct lines
      (1L, (1 to 15).map(i => f"w$i%02d").mkString(" ") + "\n" +
           (16 to 30).map(i => f"w$i%02d").mkString(" ")),
      // one line duplicated (2 of 4 occurrences belong to a repeat)
      (2L, "u01 u02 u03\nsame same1 same2\nsame same1 same2\nu04 u05 u06"),
      // one paragraph duplicated (and with it its line)
      (3L, "p01 p02\n\np03 p04\n\np01 p02"),
      // phrase loop: "spam ham" x4 then 10 distinct fillers
      (4L, Seq.fill(4)("spam ham").mkString(" ") + " " +
           (1 to 10).map(i => f"f$i%02d").mkString(" ")),
      (5L, "   ")) // blank: excluded entirely
      .toDF("doc_id", "text")
    val out = Corpus.repetitionSignals(docs, "doc_id", "text")
    val rows = out.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(!rows.contains(5L) && rows.size == 4)
    def f(id: Long, c: String): Long = rows(id).getAs[Long](c)
    def keep(id: Long): Boolean = rows(id).getAs[Boolean]("keep")
    // doc 1: t = 30*3 chars + 29 spaces = 119; longest 2/3/4-gram covers
    // 7/11/15 chars once
    assert(f(1L, "n_lines") == 2 && f(1L, "n_paras") == 1
      && f(1L, "total_chars") == 119)
    assert(f(1L, "dup_line_bp") == 0 && f(1L, "dup_para_bp") == 0)
    assert(f(1L, "top2_bp") == 70000 / 119 && f(1L, "top3_bp") == 110000 / 119
      && f(1L, "top4_bp") == 150000 / 119)
    assert((5 to 10).forall(n => f(1L, s"dup${n}_bp") == 0) && keep(1L))
    // doc 2: 2 of 4 lines are the repeat; line mass 54, repeated mass 32
    assert(f(2L, "n_lines") == 4 && f(2L, "dup_line_bp") == 5000
      && f(2L, "dup_line_char_bp") == 320000 / 54 && !keep(2L))
    // doc 3: 2 of 3 paragraphs (and lines) are the repeat, mass 14 of 21
    assert(f(3L, "n_paras") == 3 && f(3L, "dup_para_bp") == 6666
      && f(3L, "dup_para_char_bp") == 6666 && f(3L, "dup_line_bp") == 6666
      && !keep(3L))
    // doc 4: t = 8 loop tokens (28 chars) + 10 fillers (30) + 17 spaces
    // = 75; "spam ham" cnt 4 x 8 chars = 32; the two repeated 5-grams
    // mass 44 + 42 = 86 -> capped
    assert(f(4L, "total_chars") == 75 && f(4L, "top2_bp") == 320000 / 75
      && f(4L, "dup5_bp") == 10000 && !keep(4L))
  }

  test("ngram_units: hash identity + exact chars vs the string formulation") {
    // the native expression replaces xxhash64(array_join(slice(ts,i,n)))
    // with a rolling polynomial identity; what must hold is EQUIVALENCE
    // of the induced partition (equal n-grams <-> equal h) and exact
    // chars — including multi-byte tokens, where chars are characters,
    // not bytes
    val ns = Seq(2, 3)
    val docs = Seq(
      (1L, "a b a b c"),        // positions 1,3 of the 2-grams coincide
      (2L, "é ß 漢 é ß"),       // multi-byte: chars(é ß)=3 not 5
      (3L, "solo")              // shorter than every n: no units
    ).toDF("doc_id", "text")
    val units = docs
      .select(col("doc_id"), explode(graft.functions.VectorFunctions
        .ngramUnits(graft.ext.TextOps.normalized(col("text")), ns)).as("u"))
      .select(col("doc_id"), col("u.k"), col("u.h"), col("u.chars"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    assert(!units.exists(_._1 == 3L))
    val d1g2 = units.filter(u => u._1 == 1L && u._2 == 2).map(u => (u._3, u._4))
    // "a b","b a","a b","b c": 4 positions, first and third identical,
    // three distinct identities, every 2-gram 3 chars
    assert(d1g2.length == 4 && d1g2(0) == d1g2(2)
      && d1g2.distinct.length == 3 && d1g2.forall(_._2 == 3L))
    val d1g3 = units.filter(u => u._1 == 1L && u._2 == 3)
    assert(d1g3.length == 3 && d1g3.map(_._3).distinct.length == 3
      && d1g3.forall(_._4 == 5L))
    val d2g2 = units.filter(u => u._1 == 2L && u._2 == 2).map(u => (u._3, u._4))
    // "é ß","ß 漢","漢 é","é ß": first and last identical, chars = 3
    assert(d2g2.length == 4 && d2g2(0) == d2g2(3)
      && d2g2.distinct.length == 3 && d2g2.forall(_._2 == 3L))
  }

  test("ngram_units: randomized partition equivalence vs a string reference") {
    // 200 docs over a 6-token vocab (dense within-doc n-gram repeats) +
    // jagged lengths 0..24: the induced (count, chars) multiset per
    // (doc, n) must equal the joined-string grouping's — any rolling-
    // hash boundary bug (wrong P^n, off-by-one prefix, char miscount)
    // breaks some multiset
    val rnd = new scala.util.Random(9)
    val vocab = Vector("a", "bb", "ccc", "déjà", "e", "ffff")
    val ns = Seq(2, 3, 5)
    val docs = (1L to 200L).map { i =>
      (i, Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val df = docs.toDF("doc_id", "text").filter(col("text") =!= "")
    val got = df.select(col("doc_id"), explode(
        graft.functions.VectorFunctions.ngramUnits(col("text"), ns)).as("u"))
      .groupBy(col("doc_id"), col("u.k"), col("u.h"))
      .agg(count(lit(1)).as("cnt"), first(col("u.chars")).as("chars"))
      .collect()
      .groupBy(r => (r.getLong(0), r.getInt(1)))
      .map { case (k, rs) =>
        k -> rs.map(r => (r.getLong(3), r.getLong(4))).sorted.toSeq }
    val want = (for {
      (id, text) <- docs if text.nonEmpty
      toks = text.split(" ").toSeq
      n <- ns if toks.size >= n
    } yield {
      val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
      (id, n) -> grams.groupBy(identity).values
        .map(g => (g.size.toLong, g.head.length.toLong)).toSeq.sorted
    }).toMap
    assert(got.keySet == want.keySet,
      s"coverage mismatch: ${got.keySet.size} vs ${want.keySet.size}")
    got.foreach { case (k, v) =>
      assert(v == want(k), s"multiset mismatch at $k: $v vs ${want(k)}") }
  }

  test("surprisalAgainst: frozen LM reproduces self-trained surprisal; unseen priced") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog ate the bone"),
      (3L, "cat dog cat dog")).toDF("doc_id", "text")
    val lm = graft.ext.Materialize.multiScan(
      Corpus.unigramLm(docs, "doc_id", "text"))
    lm.count()
    // exactness on the training corpus: same fixed point, same integer
    // sums — scoring against the frozen table must be bit-identical to
    // the self-trained pass
    val self = Corpus.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val frozen = Corpus.surprisalAgainst(docs, lm, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(self == frozen, s"self=$self frozen=$frozen")
    // unseen tokens priced at the configured surprisal, not joined away
    val novel = Seq((9L, "zzz qqq")).toDF("doc_id", "text")
    val scored = Corpus.surprisalAgainst(novel, lm, "doc_id", "text",
        unseenNat10k = 12345L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(scored.toSeq == Seq((2L, 24690L, 12345L)), scored.toSeq.toString)
    lm.unpersist()
  }

  test("tfidfTopK ranks rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common rare1 common"),
      (2L, "common rare2"),
      (3L, "common other")).toDF("doc_id", "text")
    val out = Corpus.tfidfTopK(docs, "doc_id", "text", k = 1)
      .select("id", "token").as[(Long, String)].collect().toMap
    // 'common' appears in every doc -> idf = ln(1) = 0; any rare term wins
    assert(out(1L) == "rare1" && out(2L) == "rare2" && out(3L) == "other")
  }

  test("bm25TopK: tf saturation, length normalization, idf ordering") {
    val docs = Seq(
      (1L, "hash hash hash hash"),            // short, saturated tf on one term
      (2L, "hash join"),                      // two distinct terms, shortest
      (3L, "hash filler filler filler filler filler filler filler"), // long, tf=1
      (4L, "filler filler")).toDF("doc_id", "text") // no match
    val out = Corpus.bm25TopK(docs, "doc_id", "text",
      terms = Seq("hash", "join"), k = 10)
      .select("id", "score_x10k", "n_terms").as[(Long, Long, Long)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    // doc 4 matches no query term and must not appear
    assert(!byId.contains(4L) && out.length == 3)
    // two distinct matching terms beat one saturated term: tf saturates
    // at (k1+1) per term, so doc 2's two idf contributions outrank
    // doc 1's single capped term
    assert(byId(2L)._2 > byId(1L)._2)
    assert(byId(2L)._3 == 2 && byId(1L)._3 == 1)
    // same tf, longer doc scores lower (length normalization)
    assert(byId(1L)._2 > byId(3L)._2)
    // deterministic under re-evaluation
    val again = Corpus.bm25TopK(docs, "doc_id", "text",
      terms = Seq("hash", "join"), k = 10)
      .select("id", "score_x10k", "n_terms").as[(Long, Long, Long)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("vocabulary ranks by count desc then token asc") {
    val docs = Seq((1L, "b b a a c")).toDF("doc_id", "text")
    val out = Corpus.vocabulary(docs, "text", topN = 3)
      .select("rank", "token", "cnt").as[(Int, String, Long)].collect().toSeq
    assert(out == Seq((1, "a", 2L), (2, "b", 2L), (3, "c", 1L)))
  }

  test("scrub replaces every digit run and counts hits") {
    val (scrubbed, hits) = Corpus.scrub(col("text"))
    val out = Seq((1L, "a1b22c333 and 4"), (2L, "none")).toDF("doc_id", "text")
      .select(scrubbed.as("s"), hits.as("n")).as[(String, Int)].collect().toSet
    assert(out == Set(("a<num>b<num>c<num> and <num>", 4), ("none", 0)))
  }

  test("hashSample is deterministic and close to the requested rate") {
    val df = spark.range(10000).select(col("id"))
    val a = Corpus.hashSample(df, Seq("id"), 10).count()
    val b = Corpus.hashSample(df, Seq("id"), 10).count()
    assert(a == b, "same data + key -> same sample")
    assert(a > 700 && a < 1300, s"~10% of 10k expected, got $a")
    // nested: a 5% sample is a subset of the 10% sample (hash < 5 < 10)
    val five = Corpus.hashSample(df, Seq("id"), 5).count()
    assert(five < a)
  }

  test("xxhash64 fast-path sampling: deterministic, on-rate, no md5 in plan") {
    val df = spark.range(10000).select(col("id"))
    val fast = Corpus.hashSample(df, Seq("id"), 10, portable = false)
    val a = fast.count()
    assert(a == Corpus.hashSample(df, Seq("id"), 10, portable = false).count())
    assert(a > 700 && a < 1300, s"~10% of 10k expected, got $a")
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64") && !plan.contains("md5"),
      s"fast path must not pay md5:\n$plan")
    // quota twin: exact quota per stratum in fast mode too
    val strat = spark.range(1000)
      .select((col("id") % 3).cast("string").as("g"), col("id"))
    val q = Corpus.quotaSample(strat, Seq("g"), Seq("id"), 20, portable = false)
    assert(q.groupBy("g").count().select("count").as[Long].collect().toSeq
      == Seq(20L, 20L, 20L))
  }

  test("weightedSample: weight-proportional inclusion, deterministic, nested") {
    // 100 heavy rows at weight 1000 vs 300 light rows at weight 1: the
    // A-ES keys make heavy rows ~1000x likelier per slot, so the top-50
    // is essentially all heavy
    val df = (1L to 400L).map(i => (i, if (i <= 100) 1000L else 1L))
      .toDF("id", "w")
    def sample(k: Int) = Corpus.weightedSample(df, Seq("id"), col("w"), k)
      .select("id").as[Long].collect()
    val top50 = sample(50)
    assert(top50.length == 50)
    assert(top50.count(_ <= 100) >= 45,
      s"heavy class underrepresented: ${top50.count(_ <= 100)}/50")
    // deterministic (no seed, no partitioning dependence)
    assert(sample(50).toSeq == top50.toSeq)
    // nested: shrinking the sample never reshuffles it
    assert(sample(10).toSet.subsetOf(top50.toSet))
    // zero/negative weights can never be sampled
    val withZero = df.withColumn("w",
      when(col("id") <= 395, lit(0L)).otherwise(col("w")))
    val z = Corpus.weightedSample(withZero, Seq("id"), col("w"), 50)
      .select("id").as[Long].collect()
    assert(z.length == 5 && z.forall(_ > 395))
    // mean normalization: the SAME relative weights at a 1e9 absolute
    // scale must produce the SAME sample (pre-normalization, keys would
    // all floor to 0 and the sample would collapse to lowest ids)
    val big = df.withColumn("w", col("w") * 1000000000L)
    val topBig = Corpus.weightedSample(big, Seq("id"), col("w"), 50)
      .select("id").as[Long].collect()
    assert(topBig.toSeq == top50.toSeq,
      "absolute weight scale must not change the sample")
  }

  test("quotaSample returns exactly the quota per stratum, deterministically") {
    val df = spark.range(1000)
      .select((col("id") % 3).cast("string").as("g"), col("id"))
    val s1 = Corpus.quotaSample(df, Seq("g"), Seq("id"), 20)
    assert(s1.groupBy("g").count().select("count").as[Long].collect().toSeq
      == Seq(20L, 20L, 20L))
    val s2 = Corpus.quotaSample(df, Seq("g"), Seq("id"), 20)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(s1.select("g", "id").as[(String, Long)].collect().toSet == s2)
    // small stratum: quota clips to the stratum size
    val tiny = spark.range(5).select(lit("x").as("g"), col("id"))
    assert(Corpus.quotaSample(tiny, Seq("g"), Seq("id"), 20).count() == 5)
  }

  test("kmeans assigns every vector to one of k cells and improves fit") {
    import graft.ext.Similarity
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("embedding"))
    val n = e.count()
    val out = Similarity.kmeans(e, k = 4, maxIter = 3).cache()
    assert(out.count() == n)
    val cells = out.select("cell").distinct().as[Int].collect().toSet
    assert(cells.subsetOf((0 until 4).toSet) && cells.nonEmpty)
    out.unpersist()
  }

  test("kmeans centroid update matches per-dim avg and holds at dim 512") {
    import graft.ext.Similarity
    import graft.functions.VectorFunctions
    // agreement: the one-pass vector-sum aggregate == dim separate avgs
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("embedding"))
      .withColumn("cell", (col("id") % 3).cast("int"))
    val dim = e.select(col("embedding")).head().getSeq[Float](0).length
    val viaAgg = e.groupBy(col("cell"))
      .agg(VectorFunctions.vecSumCount(col("embedding"), dim).as("sc"))
      .select(col("cell"), col("sc.sum"), col("sc.n")).collect()
      .map(r => r.getInt(0) ->
        (r.getSeq[Double](1).map(_ / r.getLong(2)), r.getLong(2))).toMap
    val avgs = (0 until dim).map(i => avg(col("embedding")(i)))
    val viaAvg = e.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), avgs: _*).collect()
      .map(r => r.getInt(0) ->
        ((0 until dim).map(i => r.getDouble(i + 2)), r.getLong(1))).toMap
    assert(viaAgg.keySet == viaAvg.keySet)
    for (c <- viaAgg.keySet) {
      assert(viaAgg(c)._2 == viaAvg(c)._2)
      viaAgg(c)._1.zip(viaAvg(c)._1).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"cell $c: $a vs $b") }
    }
    // scale-in-dim: training at dim 512 must stay one aggregate column,
    // not 512 expressions (and complete quickly)
    val wide = spark.range(300).select(col("id"),
      transform(sequence(lit(0), lit(511)),
        i => ((hash(col("id"), i) % 1000) / 100.0).cast("float")).as("embedding"))
    val cents = Similarity.kmeansCentroids(wide, k = 4, maxIter = 2)
    assert(cents.length == 4 && cents.forall(_.length == 512))
  }

  test("semanticDecontaminate compares corpus docs whose id collides with a benchmark id") {
    import graft.ext.Similarity
    // corpus doc id=1 is a paraphrase-identical vector of benchmark doc
    // id=1: the two id namespaces are unrelated, so the collision must
    // NOT suppress the comparison (round-3 advice: the old id<>b_id
    // guard silently skipped exactly this pair)
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("id", "embedding")
    val bench = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "embedding")
    val out = Similarity.semanticDecontaminate(corpus, bench,
      "id", "embedding", tau = 0.9)
      .select("id", "n_matches").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L), s"colliding-id doc must be flagged: $out")
  }

  test("rrfFuse: exact integer points, both-list ids rise, deterministic cut") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = Corpus.rrfFuse(Seq(a, b), topK = 3)
      .select("id", "rrf_score", "n_lists")
      .as[(Long, Long, Long)].collect().toList
    def pts(r: Int): Long = 1000000000L / (60 + r)
    // 20 appears in BOTH lists and outranks every single-list id even
    // though it tops neither; 30 falls to the topK cut
    assert(out == List(
      (20L, pts(2) + pts(1), 2L),
      (10L, pts(1), 1L),
      (40L, pts(2), 1L)), out.toString)
  }

  test("decontaminateFraction scores every doc; overlap drives the verdict") {
    // doc 1 = fully inside the benchmark (100% bigram overlap), doc 2 =
    // half-contaminated, doc 3 = clean, doc 4 = too short for bigrams
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta zebra yak xerus walrus"),
      (3L, "mole newt otter pika quail"),
      (4L, "single")).toDF("doc_id", "text")
    val out = Corpus.decontaminateFraction(corpus, bench,
        "doc_id", "text", n = 2, dropAtBp = 2500)
      .select("id", "n_shingles", "n_shared", "overlap_bp", "drop")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 4, "every corpus doc must get a verdict row")
    assert(out(1L) == ((1L, 3L, 3L, 10000L, true)), out(1L).toString)
    // doc 2: bigrams (alpha beta)(beta zebra)(zebra yak)(yak xerus)
    // (xerus walrus) -> 1 of 5 shared -> 2000 bp, below the policy
    assert(out(2L) == ((2L, 5L, 1L, 2000L, false)), out(2L).toString)
    assert(out(3L)._3 == 0L && out(3L)._4 == 0L && !out(3L)._5)
    assert(out(4L) == ((4L, 0L, 0L, 0L, false)), out(4L).toString)
  }

  test("temperatureSample flattens the mixture; alpha=0.5 rates are exact") {
    // 400/100/25 split: natural shares 16:4:1 -> sqrt ratio 4:2:1
    val df = spark.range(525).select(col("id"),
      when(col("id") < 400, "big").when(col("id") < 500, "mid")
        .otherwise("small").as("src"))
    val out = Corpus.temperatureSample(df, "src", Seq("id"), alpha = 0.5)
      .select(col("src"), col("keep_rate_ppm"))
      .as[(String, Long)].collect()
    val rates = out.groupBy(_._1).map { case (s, r) => s -> r.head._2 }
    // exact integer-sqrt rates: sqrt(c/cmax)*1e6
    assert(rates == Map("big" -> 1000000L, "mid" -> 500000L, "small" -> 250000L),
      rates.toString)
    // kept counts reflect the rates: all of big, ~half of mid, ~quarter
    // of small (hash-threshold admission, deterministic)
    val kept = out.groupBy(_._1).map { case (s, r) => s -> r.size }
    assert(kept("big") == 400, kept.toString)
    assert(kept("mid") > 30 && kept("mid") < 70, kept.toString)
    assert(kept("small") > 1 && kept("small") < 13, kept.toString)
    // determinism: same admission set on re-run
    val again = Corpus.temperatureSample(df, "src", Seq("id"), alpha = 0.5)
      .select("id").as[Long].collect().toSet
    val first = Corpus.temperatureSample(df, "src", Seq("id"), alpha = 0.5)
      .select("id").as[Long].collect().toSet
    assert(again == first)
    // general alpha path still monotone: smaller alpha -> flatter
    val flat = Corpus.temperatureSample(df, "src", Seq("id"), alpha = 0.3)
      .select(col("src"), col("keep_rate_ppm")).as[(String, Long)]
      .collect().groupBy(_._1).map { case (s, r) => s -> r.head._2 }
    assert(flat("small") > rates("small") && flat("mid") > rates("mid"),
      s"alpha 0.3 must flatten more than 0.5: $flat vs $rates")
    // a NULL stratum is a real stratum: it is counted into the rates
    // AND its rows must match their rate (plain === never matches null,
    // which would silently zero-rate and drop the whole stratum)
    val withNull = spark.range(40).select(col("id"),
      when(col("id") < 30, "a").otherwise(lit(null)).as("src"))
    val outN = Corpus.temperatureSample(withNull, "src", Seq("id"), alpha = 0.5)
      .select(col("id"), col("src"), col("keep_rate_ppm"))
      .as[(Long, Option[String], Long)].collect()
    val nullRows = outN.filter(_._2.isEmpty)
    assert(nullRows.nonEmpty, s"null-stratum rows all dropped: ${outN.toSeq}")
    // rate = floor(sqrt(10/30)*1e6) via the integer-sqrt form
    assert(nullRows.forall(_._3 == 577350L), nullRows.toSeq.toString)
    // an EMPTY input (an upstream gate can empty a slice) returns empty
    // with the output schema instead of throwing on max-of-nothing
    val none = Corpus.temperatureSample(df.limit(0), "src", Seq("id"), 0.5)
    assert(none.columns.contains("keep_rate_ppm") && none.isEmpty)
  }

  test("temperatureSample handles 10k strata: broadcast rate join, no when-chain") {
    // per-domain rebalancing cardinality: a when-chain over 10^4 strata
    // would be O(#strata) expression depth (analysis/codegen blowup);
    // the broadcast rate table keeps the plan O(1) in stratum count
    val wide = spark.range(20000).select(col("id"),
      concat(lit("domain_"), (col("id") % 10000).cast("string")).as("src"))
    val out = Corpus.temperatureSample(wide, "src", Seq("id"), alpha = 0.5)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast-join:\n$plan")
    assert(!plan.contains("CaseWhen"), "rate lookup must not be a when-chain")
    // every stratum has 2 rows = c_max, so every rate is exactly 10^6
    // and every row is admitted — exact, not probabilistic
    val rows = out.select(col("keep_rate_ppm")).as[Long].collect()
    assert(rows.length == 20000 && rows.forall(_ == 1000000L))
  }

  test("semanticDedup keeps the member farthest from its centroid per cluster") {
    import graft.ext.Similarity
    // k=2 deterministic seeds = lowest-id vectors: cell0=(1,0), cell1=(0,1).
    // Cluster A = {1,3,4} (pairwise cos >= 0.9 in cell 0), cluster B =
    // {2,5} in cell 1; 6 lands in cell 1 but is near-dup of nothing.
    val df = Seq(
      (1L, Array(1.00f, 0.00f)),
      (2L, Array(0.00f, 1.00f)),
      (3L, Array(0.99f, 0.14f)),
      (4L, Array(0.98f, 0.20f)),
      (5L, Array(0.10f, 0.995f)),
      (6L, Array(0.70f, 0.714f))).toDF("id", "embedding")
    val out = Similarity.semanticDedup(df, "id", "embedding", k = 2, tau = 0.9)
      .select("id", "cell", "cluster_id", "cent_sim", "keep")
      .as[(Long, Int, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 6, "one decision row per input vector")
    assert(out.values.map(r => r._1 -> r._3).toMap ==
      Map(1L -> 1L, 3L -> 1L, 4L -> 1L, 2L -> 2L, 5L -> 2L, 6L -> 6L),
      s"components must be min-reachable-id within cells: $out")
    assert(out(6L)._2 == 1 && out(1L)._2 == 0 && out(5L)._2 == 1)
    // SemDeDup survivor = LOWEST centroid similarity (least typical):
    // cluster A cent_sims 1.0 / 0.990 / 0.980 -> id 4 survives
    assert(out.filter(_._2._5).keySet == Set(4L, 5L, 6L),
      s"survivors must be the low-cent_sim member + the singleton: $out")
    assert(out(4L)._4 == 0.980 && out(1L)._4 == 1.0, s"rounded cent_sim: $out")
  }

  test("semanticDedup exact-collapse is output-identical, incl. zero vectors") {
    import graft.ext.Similarity
    // the skew case the collapse exists for: most vectors IDENTICAL
    // (boilerplate embedded n times), plus a near-dup, uniques, and
    // zero vectors (cosine defined 0 — must never pair, so the star
    // edges must not connect them either)
    val hot = Array(0.6f, 0.8f)
    val rows = (1L to 30L).map(i => (i, hot)) ++ Seq(
      (31L, Array(0.6f, 0.79f)),
      (32L, Array(-0.9f, 0.1f)),
      (33L, Array(0f, 0f)), (34L, Array(0f, 0f)),
      (35L, Array(0.1f, -0.95f)))
    val df = rows.toDF("id", "embedding")
    def run(collapse: Boolean) =
      Similarity.semanticDedup(df, "id", "embedding", k = 2, tau = 0.9,
          collapseExact = collapse)
        .select("id", "cell", "cluster_id", "cent_sim", "keep")
        .as[(Long, Int, Long, Double, Boolean)].collect().sortBy(_._1).toList
    val collapsed = run(true)
    val allPairs = run(false)
    assert(collapsed == allPairs,
      s"collapse changed output:\n$collapsed\nvs\n$allPairs")
    val byId = collapsed.map(r => r._1 -> r).toMap
    // the 30 identical + the near-dup form ONE cluster (label = min id)
    (2L to 31L).foreach(i => assert(byId(i)._3 == 1L, s"doc $i: ${byId(i)}"))
    // zero vectors stay singletons and keep themselves
    Seq(33L, 34L).foreach { i =>
      assert(byId(i)._3 == i && byId(i)._5, s"zero vec $i: ${byId(i)}")
    }
  }

  test("semanticDedup with trained cells keeps one decision row per vector") {
    import graft.ext.Similarity
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), col("embedding"))
    val n = e.count()
    val out = Similarity.semanticDedup(e, "id", "embedding",
      k = 4, tau = 0.5, trainIters = 2).cache()
    assert(out.count() == n)
    // decisions are a partition: every cluster has exactly one keeper
    val perCluster = out.groupBy(col("cluster_id"))
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"))
      .select("n_keep").as[Long].collect()
    assert(perCluster.forall(_ == 1L), "exactly one survivor per cluster")
    out.unpersist()
  }

  test("sortedNeighborhood pairs each row with its w successors, equi-join plan") {
    val df = Seq((10L, "aa"), (20L, "ab"), (30L, "ac"), (40L, "zz"))
      .toDF("id", "name")
    val out = Corpus.sortedNeighborhood(df, Seq("name"), "id", window = 2)
      .select(col("a.id").as("ia"), col("b.id").as("ib"))
    val pairs = out.as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 20L), (10L, 30L), (20L, 30L), (20L, 40L), (30L, 40L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"rank-range must plan as an equi-join, got:\n$plan")
  }

  test("chunk covers every token with the requested overlap") {
    // 11 tokens, size 5, overlap 2 -> stride 3 -> starts 1,4,7; the
    // chunk at 7 spans tokens 7..11, so every token is covered
    val docs = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11")).toDF("doc_id", "text")
    val out = Corpus.chunk(docs, "doc_id", "text", chunkSize = 5, overlap = 2)
      .select("chunk_no", "tok_start", "chunk_text")
      .as[(Int, Int, String)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(1, 4, 7))
    assert(out.head._3 == "t1 t2 t3 t4 t5")
    assert(out(1)._3 == "t4 t5 t6 t7 t8", "2-token overlap")
    assert(out.last._3 == "t7 t8 t9 t10 t11", "tail chunk reaches the end")
    // short doc -> exactly one chunk; empty doc -> none
    val edge = Seq((1L, "a b"), (2L, " ")).toDF("doc_id", "text")
    val e = Corpus.chunk(edge, "doc_id", "text", 5, 2)
      .select("id", "chunk_text").as[(Long, String)].collect()
    assert(e.toSeq == Seq((1L, "a b")))
  }

  test("pack fills budgets in id order; doc belongs where it starts") {
    val docs = Seq((1L, "a " * 50), (2L, "b " * 60), (3L, "c " * 30))
      .toDF("doc_id", "text")
    val out = Corpus.pack(docs, "doc_id", "text", budget = 100)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    // cum starts: doc1 at 0 -> pack 0; doc2 at 50 -> pack 0; doc3 at 110 -> pack 1
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "completely unrelated content here now")).toDF("doc_id", "text")
    val bench = Seq((100L, "xx the quick brown fox jumps yy")).toDF("doc_id", "text")
    val out = Corpus.decontaminate(corpus, bench, "doc_id", "text", n = 5)
      .select("id", "n_shared").as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L), "only the overlapping doc is flagged")
    assert(out(1L) == 1L) // shares exactly "the quick brown fox jumps"
  }

  test("KMV distinct estimate lands near exact; small groups are exact") {
    import graft.ext.Sketch
    // NOTE: g and v must be independent — id%2 and id%5000 share parity,
    // so each group sees only 2500 distinct v values
    val df = spark.range(30000)
      .select((col("id") % 2).as("g"), (col("id") % 5000).as("v"))
    val est = Sketch.kmvDistinct(df, Seq("g"), "v", k = 64)
      .select("g", "est_distinct").as[(Long, Long)].collect().toMap
    est.values.foreach { e =>
      assert(math.abs(e - 2500.0) / 2500.0 < 0.4,
        s"KMV(64) estimate $e too far from 2500") // rsd ~ 1/sqrt(64)
    }
    // fewer than k distinct values -> exact count
    val tiny = spark.range(1000).select(lit(0L).as("g"), (col("id") % 10).as("v"))
    assert(Sketch.kmvDistinct(tiny, Seq("g"), "v", k = 64)
      .select("est_distinct").as[Long].head() == 10L)
  }

  test("KMV bottom-k aggregate reproduces the order-statistic formula exactly") {
    import graft.ext.{Sketch, TextOps}
    val df = spark.range(30000)
      .select((col("id") % 2).as("g"), (col("id") % 5000).as("v"))
    // independent reference: full distinct hash sets, sorted on the driver
    val hashes = df
      .select(col("g"), TextOps.portableHash(col("v").cast("string")).as("h"))
      .distinct().as[(Long, Long)].collect()
    val expected = hashes.groupBy(_._1).map { case (g, hs) =>
      val sorted = hs.map(_._2).distinct.sorted
      val e = if (sorted.length < 64) sorted.length.toLong
        else math.floor(63L * (1L << 60).toDouble / sorted(63)).toLong
      g -> e
    }
    val got = Sketch.kmvDistinct(df, Seq("g"), "v", k = 64)
      .select("g", "est_distinct").as[(Long, Long)].collect().toMap
    assert(got == expected, "aggregate must equal the exact k-th order statistic")
  }

  test("pack global running sum equals a driver-side prefix sum at scale-ish n") {
    // enough rows to span many range partitions
    val docs = spark.range(5000)
      .select(col("id"), concat_ws(" ",
        transform(sequence(lit(1), (col("id") % 17 + 1).cast("int")),
          _ => lit("w"))).as("text"))
    val out = Corpus.pack(docs, "id", "text", budget = 300)
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    var running = 0L
    out.foreach { case (id, cum) =>
      running += id % 17 + 1
      assert(cum == running, s"prefix sum diverged at id=$id")
    }
  }

  test("prefix-based operators survive degenerate inputs") {
    import graft.ext.Sketch
    val empty = spark.range(0).select(col("id"), lit("x").as("text"))
    assert(Corpus.pack(empty, "id", "text", budget = 10).count() == 0)
    assert(Corpus.sortedNeighborhood(
      empty.withColumnRenamed("text", "name"), Seq("name"), "id", 3).count() == 0)
    assert(Sketch.kmvDistinct(empty, Seq("text"), "id", 8).count() == 0)
    // single row; window larger than the relation; topN larger than vocab
    val one = Seq((1L, "solo doc")).toDF("id", "text")
    assert(Corpus.pack(one, "id", "text", 10).select("pack_id").as[Long].head() == 0L)
    assert(Corpus.sortedNeighborhood(
      one.withColumnRenamed("text", "name"), Seq("name"), "id", 5).count() == 0)
    assert(Corpus.vocabulary(one, "text", topN = 100).count() == 2)
  }

  test("native md5_prefix equals the builtin conv(substring(md5)) formula") {
    import graft.ext.TextOps
    val df = spark.range(5000).select(col("id").cast("string").as("s"))
    val mismatches = df.select(
        TextOps.portableHash(col("s")).as("native"),
        TextOps.portableHashBuiltin(col("s")).as("builtin"),
        graft.ext.Dedup.portableHash32(col("s")).as("n32"),
        org.apache.spark.sql.functions.conv(
          substring(md5(col("s")), 1, 8), 16, 10).cast("long").as("b32"))
      .filter(col("native") =!= col("builtin") || col("n32") =!= col("b32"))
      .count()
    assert(mismatches == 0, "digest-prefix fast path must be bit-identical")
  }

  test("KmvBuffer fuzz: insert/merge in any order equals sorted-distinct-take-k") {
    import graft.functions.KmvBuffer
    val rnd = new scala.util.Random(7)
    (1 to 50).foreach { trial =>
      val k = 1 + rnd.nextInt(16)
      // duplicates and a small value range force collision/dedup paths
      val values = Array.fill(rnd.nextInt(200))(rnd.nextInt(60).toLong)
      val expected = values.distinct.sorted.take(k).toSeq
      // single-buffer insert order
      val one = new KmvBuffer(k)
      values.foreach(one.add)
      assert(one.arr.take(one.n).toSeq == expected, s"trial $trial single")
      // random split + merge (the map-side partial path)
      val (l, r) = values.splitAt(rnd.nextInt(values.length + 1))
      val bl = new KmvBuffer(k); l.foreach(bl.add)
      val br = new KmvBuffer(k); r.foreach(br.add)
      bl.merge(br)
      assert(bl.arr.take(bl.n).toSeq == expected, s"trial $trial merged")
    }
  }

  test("approx_count_distinct at rsd=0.02 stays within 6% of exact") {
    val df = spark.range(50000)
      .select((col("id") % 4).as("g"), (col("id") % 7919).as("v"))
    val got = df.groupBy("g")
      .agg(approx_count_distinct(col("v"), 0.02).as("a"),
        countDistinct(col("v")).as("e"))
      .select("a", "e").as[(Long, Long)].collect()
    got.foreach { case (a, e) =>
      assert(math.abs(a - e).toDouble / e < 0.06, s"approx $a vs exact $e")
    }
  }

  test("temperature rates at alpha 0.25/0.75: exact double-isqrt, monotone family") {
    // strata with known counts; rates must equal the BigInt double-
    // integer-sqrt closed form exactly, and the alpha family must order
    // correctly per stratum: flatter alpha => higher rate for every
    // non-heaviest stratum (heaviest pinned at ppm for all alphas)
    val sizes = Map("a" -> 1000, "b" -> 500, "c" -> 100)
    val docs = sizes.toSeq.flatMap { case (s, n) =>
      (0 until n).map(i => (s"$s$i", s)) }.toDF("doc_id", "source")
    def rates(alpha: Double): Map[String, Long] =
      Corpus.temperatureSample(docs, "source", Seq("doc_id"), alpha)
        .select("source", "keep_rate_ppm").distinct()
        .as[(String, Long)].collect().toMap
    val ppm = BigInt(1000000)
    def isq(n: BigInt) = graft.ext.Corpus.isqrt(n)
    def want25(c: Int, cMax: Int) =
      isq(isq(BigInt(c) * ppm.pow(4) / cMax)).toLong
    def want75(c: Int, cMax: Int) =
      isq(isq(BigInt(c).pow(3) * ppm.pow(4) / BigInt(cMax).pow(3))).toLong
    val (r25, r50, r75) = (rates(0.25), rates(0.5), rates(0.75))
    for ((s, c) <- sizes) {
      assert(r25(s) == want25(c, 1000), s"a25 $s: ${r25(s)}")
      assert(r75(s) == want75(c, 1000), s"a75 $s: ${r75(s)}")
      if (c < 1000) assert(r25(s) > r50(s) && r50(s) > r75(s),
        s"family order at $s")
      else assert(r25(s) == 1000000L && r75(s) == 1000000L)
    }
    // the closed form itself vs the real-valued power across magnitudes
    // (floor forms may sit at most 1 below the rounded real value), and
    // the driver isqrt is the true integer sqrt at radicand scale ppm⁴
    for (c <- Seq(1, 7, 99, 5000, 54321); cMax <- Seq(54321, 100000)) {
      val real25 = math.pow(c.toDouble / cMax, 0.25) * 1e6
      assert(math.abs(want25(c, cMax) - real25) <= 1, s"a25 $c/$cMax")
      val real75 = math.pow(c.toDouble / cMax, 0.75) * 1e6
      assert(math.abs(want75(c, cMax) - real75) <= 1, s"a75 $c/$cMax")
    }
    val big = BigInt(10).pow(24) - 1
    assert(isq(big).pow(2) <= big && (isq(big) + 1).pow(2) > big)
  }

  test("backoffSurprisal: type-factored form equals the per-position form (fuzz over minCount)") {
    // The r9 factorization scores cutoff-bounded trigram TYPES (level 3)
    // and bigram types (levels 2/1), then weights by per-doc position
    // counts — it must be row-identical to the straightforward
    // per-position formulation (the r8 shape, inlined here as the
    // reference) for every minCount, including 1 (no pruning: every
    // position scores level 3) and a cutoff high enough that everything
    // falls through to levels 2/1.
    val rnd = new scala.util.Random(41)
    val phrases = Vector("the cat sat on the mat", "a dog ran fast",
      "the cat sat", "lorem ipsum dolor sit amet", "qq ww ee")
    val docs = (0L until 120L).map { i =>
      val n = 1 + rnd.nextInt(4)
      (i, Seq.fill(n)(phrases(rnd.nextInt(phrases.size))).mkString(" ") +
        (if (rnd.nextBoolean()) s" unique${i}a unique${i}b unique${i}c" else ""))
    }.toDF("doc_id", "text")
    def reference(minCount: Int): Map[Long, (Long, Long, Long, Long, Long)] = {
      val ds = docs.select(col("doc_id").as("id"),
        split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ").as("ts"))
      val uni = ds.select(explode(col("ts")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("cu"))
      val tot = uni.agg(sum(col("cu")).as("n_total"))
      val bi = ds.filter(size(col("ts")) >= 2)
        .select(explode(expr("transform(sequence(0, size(ts)-2), i -> struct(ts[i] as a, ts[i+1] as b))")).as("g"))
        .select(col("g.a").as("a"), col("g.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cb"))
      val tg = ds.filter(size(col("ts")) >= 3)
        .select(col("id"), explode(expr("transform(sequence(0, size(ts)-3), i -> struct(ts[i] as t1, ts[i+1] as t2, ts[i+2] as t3))")).as("g"))
        .select(col("id"), col("g.t1").as("t1"), col("g.t2").as("t2"), col("g.t3").as("t3"))
      val tri = tg.groupBy("t1", "t2", "t3").agg(count(lit(1)).as("ct"))
      tg.join(tri, Seq("t1", "t2", "t3"))
        .join(bi.select(col("a").as("t1"), col("b").as("t2"), col("cb").as("c12")), Seq("t1", "t2"))
        .join(bi.select(col("a").as("t2"), col("b").as("t3"), col("cb").as("c23")), Seq("t2", "t3"))
        .join(uni.select(col("t").as("t2"), col("cu").as("cu2")), Seq("t2"))
        .join(uni.select(col("t").as("t3"), col("cu").as("cu3")), Seq("t3"))
        .crossJoin(tot)
        .withColumn("lvl", when(col("ct") >= minCount, lit(3))
          .when(col("c23") >= minCount, lit(2)).otherwise(lit(1)))
        .withColumn("nat10k", floor(-log(
          when(col("lvl") === 3, col("ct").cast("double") / col("c12"))
            .when(col("lvl") === 2, lit(0.4) * col("c23") / col("cu2"))
            .otherwise(lit(0.16) * col("cu3") / col("n_total")))
          * 10000 + 0.5).cast("long"))
        .groupBy("id")
        .agg(count(lit(1)).as("n_trigrams"),
          sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_tri_hits"),
          sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_bi_backoff"),
          sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_uni_backoff"),
          sum(col("nat10k")).as("surprisal_x10k"))
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    }
    for (mc <- Seq(1, 2, 3, 1000)) {
      val got = Corpus.backoffSurprisal(docs, "doc_id", "text", minCount = mc)
        .select("id", "n_trigrams", "n_tri_hits", "n_bi_backoff",
          "n_uni_backoff", "surprisal_x10k")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
      val want = reference(mc)
      assert(got == want, s"minCount=$mc diverges: " +
        got.collect { case (k, v) if want.get(k) != Some(v) => (k, v, want.get(k)) }
          .take(3).toString)
    }
  }

  test("prepV4: the exact cut sees only the policy-filtered slice") {
    // Lee et al.'s deployment shape means filter-THEN-cut: a duplicated
    // span whose only other copy lives in a policy-REJECTED document
    // must NOT be cut (that copy never reaches the exact pass), while a
    // span shared by two SURVIVING documents is cut from the
    // non-canonical one. Both scenarios in one corpus.
    val stop = "the and of to in is on for it with"
    // 60 words, mean length in Gopher's window, two distinct stopwords
    def goodDoc(tag: String): String =
      (1 to 50).map(i => s"word$i").mkString(" ") + " " + stop + " " + tag
    val sharedAB = "unique shared passage spanning well over forty bytes " +
      "of text for the cut to bind on"
    // stopword-free (doc 3 must fail Gopher's >=2-distinct-stopwords rule)
    val sharedAX = "other shared passage also spanning well over forty " +
      "bytes exclusively inside rejected doc copy"
    val docs = Seq(
      (1L, goodDoc("alpha") + " " + sharedAB + " " + sharedAX), // survivor
      (2L, goodDoc("beta") + " " + sharedAB),                   // survivor
      // shares sharedAX with doc 1 but has ZERO stopwords -> Gopher
      // rejects it, so sharedAX must survive in doc 1 uncut
      (3L, (1 to 55).map(i => s"zz$i").mkString(" ") + " " + sharedAX))
      .toDF("doc_id", "text")
    val out = Corpus.prepV4(docs, "doc_id", "text",
        stopwords = graft.ext.TextOps.Stopwords, budgetBytes = 1000000)
      .collect()
    assert(out.length == 1, s"one pack expected: ${out.toSeq}")
    val r = out(0)
    val (nDocs, packBytes, cutBytes) =
      (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nDocs == 2L, "doc 3 is policy-rejected before the cut")
    // docs 1 and 2 share their goodDoc prefix AND sharedAB; doc 1 is
    // canonical throughout (lower id), so the cut falls entirely on
    // doc 2. Crucially sharedAX is NOT cut from doc 1 — its only other
    // copy lives in the policy-rejected doc 3, which never reaches the
    // exact pass. A driver-side replica replays windows + islands over
    // the two surviving texts.
    val norm = (s: String) =>
      s.toLowerCase.replaceAll("\\s+", " ").trim
    def expectedCut: Long = {
      val t1 = norm(goodDoc("alpha") + " " + sharedAB + " " + sharedAX)
      val t2 = norm(goodDoc("beta") + " " + sharedAB)
      val w1 = (0 to t1.length - 40).map(p => t1.substring(p, p + 40)).toSet
      val dupPs = (0 to t2.length - 40)
        .filter(p => w1.contains(t2.substring(p, p + 40)))
      // island pass (the operator's rule: a window joins the current
      // island unless it starts past the island's end)
      var cut = 0L; var s = -1; var e = -1
      for (p <- dupPs) {
        if (s < 0 || p > e) { if (s >= 0) cut += e - s; s = p }
        e = p + 40
      }
      if (s >= 0) cut += e - s
      cut
    }
    assert(cutBytes == expectedCut,
      s"cut=$cutBytes expected=$expectedCut — the cut must bind on the " +
        "survivor-shared regions only, never on the rejected doc's sharedAX")
    assert(cutBytes >= 40L, "the planted duplicate spans must be cut")
    val totalClean = norm(goodDoc("alpha") + " " + sharedAB + " " +
      sharedAX).length + norm(goodDoc("beta") + " " + sharedAB).length -
      cutBytes
    assert(packBytes == totalClean.toLong)
  }

  test("corpusCard: dup rate, lang mode tiebreak, exact percentiles, portable rounding") {
    // src A: 4 docs, two exact copies (normalization collapses case /
    // whitespace) -> dup_rate 0.25; langs en,en,de,de -> count tie,
    // mode = lexicographically LARGER lang = "en"... (e < d is false:
    // "en" > "de") -> "en"; chars 10,20,30,40 -> p50 = 25.0, p90 = 37.0
    // (h = .9*3 = 2.7 -> .3*30 + .7*40)
    val rows = Seq(
      (1L, "Alpha  Beta", "en", "A", 10L),
      (2L, "alpha beta", "en", "A", 20L), // exact dup of 1 after norm
      (3L, "gamma delta words", "de", "A", 30L),
      (4L, "epsilon zeta eta", "de", "A", 40L),
      (5L, "unique content here", "fr", "B", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val card = Corpus.corpusCard(rows, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = card("A")
    assert(a.getLong(1) == 4L && a.getLong(2) == 100L) // n_docs, chars
    assert(a.getDouble(3) == 0.25, "one of four is an exact dup")
    assert(a.getString(4) == "en" && a.getDouble(5) == 0.5,
      "2-2 lang tie breaks to the lexicographically larger lang")
    assert(a.getLong(6) == 2L + 2L + 3L + 3L) // total tokens
    assert(a.getDouble(7) == 2.5) // mean_toks
    assert(a.getDouble(8) == 25.0 && a.getDouble(9) == 37.0,
      s"percentiles: got ${a.getDouble(8)}, ${a.getDouble(9)}")
    val b = card("B")
    assert(b.getLong(1) == 1L && b.getDouble(3) == 0.0 &&
      b.getString(4) == "fr" && b.getDouble(8) == 7.0)
  }

  test("crossSourceDup / crossSourceQuotes: pair-relation-generic matrix, diagonal, direction") {
    // sources: A = {1, 2, 3}, B = {10, 11}, C = {20}. Dup pairs
    // (unordered, id_a < id_b): (1,10) cross A-B, (2,3) within A.
    // Doc 20 (source C) has no partner.
    val srcRows = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (10L, "B"), (11L, "B"), (20L, "C")).toDF("id", "source")
    val pairs = Seq((1L, 10L), (2L, 3L)).toDF("id_a", "id_b")
    val m = Corpus.crossSourceDup(pairs, srcRows)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // ordered rows: (A,B) sees doc 1 of A's 3 -> share 1/3 rounded;
    // (B,A) sees doc 10 of B's 2; diagonal (A,A) holds docs 2 AND 3
    assert(m(("A", "B")) == ((1L, 0.3333)))
    assert(m(("B", "A")) == ((1L, 0.5)))
    assert(m(("A", "A")) == ((2L, 0.6667)),
      "a within-source pair contributes BOTH its docs to the diagonal")
    assert(!m.keySet.exists { case (s, o) => s == "C" || o == "C" },
      "sources with no partner produce no row (sparse matrix)")
    // directed quotes: doc 1 (A) quoted inside doc 10 (B); doc 11 (B)
    // quoted inside doc 2 (A) — the two directions must NOT fold
    val cont = Seq((1L, 10L), (11L, 2L)).toDF("src_id", "host_id")
    val q = Corpus.crossSourceQuotes(cont, srcRows)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(q(("A", "B")) == ((1L, 0.3333)), "A quoted in B")
    assert(q(("B", "A")) == ((1L, 0.5)), "B quoted in A — distinct entry")
    assert(q.size == 2, s"no orientation folding: $q")
    // n_docs de-dupes: one doc quoted in TWO hosts of a source counts once
    val multi = Seq((1L, 10L), (1L, 11L)).toDF("src_id", "host_id")
    val qm = Corpus.crossSourceQuotes(multi, srcRows)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap
    assert(qm(("A", "B")) == 1L)
  }

  test("decontaminateContainment: benchmark-side denominator catches the quote the fraction form dilutes") {
    // bench item 100: 5 words -> 4 distinct bigrams. doc 1 embeds the
    // item verbatim inside 40 filler words; doc 2 is clean.
    val item = "alpha beta gamma delta epsilon"
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$filler $item"),
      (2L, filler)).toDF("doc_id", "text")
    val bench = Seq((100L, item)).toDF("doc_id", "text")
    val out = Corpus.decontaminateContainment(corpus, bench,
      "doc_id", "text", n = 2, dropAtBp = 8000)
      .collect().map(r => r.getLong(0) -> r).toMap
    // all 4 of the item's bigrams are inside doc 1 -> containment 10000
    assert(out(1L).getAs[Long]("max_cont_bp") == 10000L)
    assert(out(1L).getAs[Long]("worst_bench") == 100L)
    assert(out(1L).getAs[Boolean]("drop"))
    assert(out(2L).getAs[Long]("max_cont_bp") == 0L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("worst_bench")))
    assert(!out(2L).getAs[Boolean]("drop"))
    // the FRACTION form scores the same leak at ~4/44 of the doc's
    // bigrams — far under its own default threshold: the structural gap
    val frac = Corpus.decontaminateFraction(corpus, bench,
      "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!frac(1L).getAs[Boolean]("drop"))
    assert(frac(1L).getAs[Long]("overlap_bp") < 2500)
    // tie on cont_bp -> smallest bench id wins worst_bench
    val bench2 = Seq((100L, item), (50L, item)).toDF("doc_id", "text")
    val tied = Corpus.decontaminateContainment(corpus, bench2,
      "doc_id", "text", n = 2, dropAtBp = 8000)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(tied(1L).getAs[Long]("worst_bench") == 50L)
  }

  test("scriptMix: planted mixed-script text counts every class; dominant ties break by declared order") {
    val df = Seq(
      (1L, "abc где 12 ."),          // latin 3, cyrillic 3, digit 2, space 3, other 1
      (2L, "你好世界"),               // pure cjk
      (3L, ""),                      // empty -> none
      (4L, "ab 12")                  // latin 2 == digit 2 tie -> latin (declared order)
    ).toDF("doc_id", "t")
    val out = graft.ext.TextOps.scriptMix(df, "doc_id", "t")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_chars") == 12L)
    assert(r1.getAs[Long]("n_latin") == 3L)
    assert(r1.getAs[Long]("n_cyrillic") == 3L)
    assert(r1.getAs[Long]("n_digit") == 2L)
    assert(r1.getAs[Long]("n_space") == 3L)
    assert(r1.getAs[Long]("n_other") == 1L)
    assert(r1.getAs[Long]("latin_bp") == 3L * 10000L / 12L)
    assert(r1.getAs[String]("dominant") == "latin") // 3 == 3 tie -> latin first
    assert(out(2L).getAs[String]("dominant") == "cjk")
    assert(out(2L).getAs[Long]("cjk_bp") == 10000L)
    assert(out(3L).getAs[String]("dominant") == "none")
    assert(out(3L).getAs[Long]("n_chars") == 0L)
    assert(out(4L).getAs[String]("dominant") == "latin")
  }

  test("corpusDigest: equal sets match, any difference moves the digest, incremental XOR toggle") {
    val a = Seq((1L, "x", "doc one"), (2L, "x", "doc two"),
      (3L, "y", "doc three")).toDF("id", "src", "t")
    // same contents, different ids/order, plus an exact dup (multiset
    // grows, SET digest unchanged, n_docs catches it)
    val b = Seq((9L, "x", "doc two"), (8L, "x", "doc one"),
      (7L, "x", "doc one"), (5L, "y", "doc three")).toDF("id", "src", "t")
    def dig(df: org.apache.spark.sql.DataFrame) =
      Corpus.corpusDigest(df, "t", "src").collect()
        .map(r => r.getString(0) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_distinct"),
            r.getAs[Long]("digest60")))).toMap
    val (da, db) = (dig(a), dig(b))
    assert(da("x")._3 == db("x")._3, "same content set, same digest")
    assert(da("y") == db("y"))
    assert(da("x")._1 == 2L && db("x")._1 == 3L,
      "doc count catches the duplicate the set digest ignores")
    assert(da("x")._2 == 2L && db("x")._2 == 2L)
    // removing one distinct content toggles exactly its hash (XHASH)
    val c = dig(a.filter(col("id") =!= 2L))
    val h2 = graft.ext.TextOps.portableHash(
      graft.ext.TextOps.fingerprint(lit("doc two")))
    val h2v = a.sparkSession.range(1).select(h2).collect()(0).getLong(0)
    assert((da("x")._3 ^ h2v) == c("x")._3,
      "digest is incrementally maintainable by XOR of the delta")
    // a changed byte moves the digest
    val d = dig(a.withColumn("t",
      when(col("id") === 1L, lit("doc one!")).otherwise(col("t"))))
    assert(d("x")._3 != da("x")._3)
  }

  test("packOrdered: fill order respected, same doc multiset as arrival-order pack") {
    val docs = Seq(
      (1L, (1 to 3).map(_ => "w").mkString(" ")),   // 3 tokens
      (2L, (1 to 9).map(_ => "w").mkString(" ")),   // 9
      (3L, (1 to 9).map(_ => "w").mkString(" ")),   // 9
      (4L, (1 to 2).map(_ => "w").mkString(" "))    // 2
    ).toDF("doc_id", "t")
    val out = Corpus.packOrdered(docs, "doc_id", "t", budget = 10,
        order = Seq(col("n_tokens").desc, col("id")))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("pack_id"), r.getAs[Long]("cum")))).toMap
    // fill order: 9(id2), 9(id3), 3(id1), 2(id4); cums 9, 18, 21, 23
    // packs: (cum-n)//10 -> 0, 0, 1, 2
    assert(out(2L) == ((0L, 9L)))
    assert(out(3L) == ((0L, 18L)))
    assert(out(1L) == ((1L, 21L)))
    assert(out(4L) == ((2L, 23L)))
    // same docs, same total — only the permutation differs from pack()
    val plain = Corpus.pack(docs, "doc_id", "t", budget = 10)
    assert(plain.agg(sum(col("n_tokens"))).collect()(0).getLong(0) == 23L)
    intercept[IllegalArgumentException] {
      Corpus.packOrdered(docs, "doc_id", "t", 10, Seq.empty)
    }
  }

  test("packStats: hand-computed fill, straddle overflow, oversize doc") {
    // budget 10. docs in id order: 6, 6, 10, 25. cum: 6,12,22,47.
    // pack of doc = (cum - n) // 10 -> 0, 0, 1, 2.
    // pack 0: 12 tok (overflows), pack 1: 10, pack 2: 25 (overflows,
    // and the doc itself is oversize). fill = 47 / 30.
    val docs = Seq(
      (1L, (1 to 6).map(_ => "w").mkString(" ")),
      (2L, (1 to 6).map(_ => "w").mkString(" ")),
      (3L, (1 to 10).map(_ => "w").mkString(" ")),
      (4L, (1 to 25).map(_ => "w").mkString(" "))).toDF("doc_id", "t")
    val r = Corpus.packStats(
      Corpus.pack(docs, "doc_id", "t", budget = 10), budget = 10)
      .collect().head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_packs") == 3L)
    assert(r.getAs[Long]("total_tokens") == 47L)
    assert(r.getAs[Long]("fill_bp") == 47L * 10000L / 30L)
    assert(r.getAs[Long]("n_over_budget") == 2L)
    assert(r.getAs[Long]("n_oversize_docs") == 1L)
  }

  test("charEntropy: closed-form values, empty doc, repeated-char floor") {
    val df = Seq(
      (1L, "aaaa"),      // one symbol -> H = 0
      (2L, "ab"),        // two equiprobable -> H = ln 2
      (3L, "aabb"),      // H = ln 2 again (2+2)
      (4L, "")           // empty -> n = 0, entropy 0
    ).toDF("doc_id", "t")
    val out = graft.ext.TextOps.charEntropy(df, "doc_id", "t")
      .collect().map(r => r.getLong(0) -> r).toMap
    def expected(counts: Seq[Long]): Long = {
      val n = counts.sum
      val t = counts.map(c =>
        math.floor(c.toDouble * math.log(c.toDouble) * 1e6 + 0.5).toLong).sum
      math.floor(math.log(n.toDouble) * 1e6 + 0.5).toLong - t / n
    }
    assert(out(1L).getAs[Long]("entropy_micro") == 0L)
    assert(out(1L).getAs[Long]("n") == 4L)
    assert(out(2L).getAs[Long]("entropy_micro") == expected(Seq(1L, 1L)))
    // ln 2 in micro-nats
    assert(math.abs(out(2L).getAs[Long]("entropy_micro") - 693147L) <= 1L)
    assert(out(3L).getAs[Long]("entropy_micro") == expected(Seq(2L, 2L)))
    assert(out(4L).getAs[Long]("n") == 0L &&
      out(4L).getAs[Long]("entropy_micro") == 0L)
  }

  // shared training seeds for the learned language-id family: a few
  // sentences per language, the shape a frozen lid model is built from
  private lazy val langSeeds = Seq(
    ("en", "the quick brown fox jumps over the lazy dog and then it runs away into the green forest with all of the other animals"),
    ("en", "it is a truth universally acknowledged that a single man in possession of a good fortune must be in want of a wife"),
    ("de", "der schnelle braune fuchs springt über den faulen hund und läuft dann in den grünen wald zu den anderen tieren davon"),
    ("de", "es ist eine allgemein anerkannte wahrheit dass ein alleinstehender mann im besitz eines guten vermögens eine frau braucht"),
    ("fr", "le rapide renard brun saute par dessus le chien paresseux et court ensuite dans la forêt verte avec tous les autres animaux"),
    ("fr", "c'est une vérité universellement reconnue qu'un célibataire pourvu d'une belle fortune doit avoir envie de se marier"),
    ("es", "el rápido zorro marrón salta sobre el perro perezoso y luego corre hacia el bosque verde con todos los demás animales"),
    ("es", "es una verdad mundialmente reconocida que un hombre soltero poseedor de una gran fortuna necesita una esposa"),
    ("zh", "敏捷的棕色狐狸跳过了懒惰的狗然后跑进绿色的森林和其他动物在一起"),
    ("zh", "众所周知单身汉拥有大笔财富就必然需要一位妻子这是一条举世公认的真理"))
    .zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }

  test("decontaminateSpans: a short verbatim quote inside a long page " +
      "is caught at full strength where the fraction form dilutes it") {
    val quote = "the seventeen quick brown foxes jumped over the lazy sleeping dogs"
    val filler = (1 to 120).map(i => s"fill$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$filler $quote $filler"), // long page embedding the quote
      (2L, s"completely unrelated page $filler")).toDF("doc_id", "text")
    val bench = Seq((100L, quote)).toDF("doc_id", "text")
    val r = Corpus.decontaminateSpans(corpus, bench, "doc_id", "text",
        winBytes = 40, anchorMod = 4, dropAtBp = 100)
      .collect().map(x => x.getLong(0) -> x).toMap
    val hit = r(1L)
    assert(hit.getAs[Long]("n_dup_windows") > 0 &&
      hit.getAs[Long]("covered_bytes") > 0 &&
      hit.getAs[Long]("n_bench_docs") == 1L &&
      hit.getAs[Boolean]("drop"), s"quote page must flag: $hit")
    // the quote is ~66 of ~1600 bytes -> the FRACTION form sees a tiny
    // overlap share; the span form flags the exact leak regardless
    assert(hit.getAs[Long]("cov_bp") < 1000,
      "fixture must be the small-quote-in-long-page shape")
    val clean = r(2L)
    assert(clean.getAs[Long]("n_dup_windows") == 0L &&
      !clean.getAs[Boolean]("drop"), s"clean page must pass: $clean")
  }

  test("decontaminateRewrite: the leaked quote is cut surgically — " +
      "clean docs pass byte-identical, a fully-leaked doc rewrites to " +
      "empty, and the winnowed screen is byte-identical above its floor") {
    val quote = "the seventeen quick brown foxes jumped over the lazy sleeping dogs"
    val filler = (1 to 120).map(i => s"fill$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$filler $quote $filler"), // long page embedding the quote
      (2L, s"completely unrelated page $filler"),
      (3L, quote)) // the benchmark item itself crawled verbatim
      .toDF("doc_id", "text")
    val bench = Seq((100L, quote)).toDF("doc_id", "text")
    val r = Corpus.decontaminateRewrite(corpus, bench, "doc_id", "text",
        winBytes = 40)
      .collect().map(x => x.getLong(0) -> x).toMap
    val hit = r(1L)
    assert(hit.getAs[Long]("n_spans_cut") == 1L &&
      hit.getAs[Long]("cut_bytes") == quote.length &&
      hit.getAs[Long]("clean_bytes") ==
        hit.getAs[Long]("n_bytes") - quote.length,
      s"quote must be cut exactly: $hit")
    val clean = r(2L)
    assert(clean.getAs[Long]("n_spans_cut") == 0L &&
      clean.getAs[Long]("clean_bytes") == clean.getAs[Long]("n_bytes"),
      s"clean page must pass uncut: $clean")
    // byte-identical pass-through: clean_fp == the content fingerprint
    val fp2 = corpus.filter(col("doc_id") === 2L)
      .select(graft.ext.TextOps.fingerprint(col("text")))
      .head.getString(0)
    assert(clean.getAs[String]("clean_fp") == fp2)
    val full = r(3L)
    assert(full.getAs[Long]("clean_bytes") == 0L &&
      full.getAs[String]("clean_fp") ==
        "d41d8cd98f00b204e9800998ecf8427e",
      s"fully-leaked doc must rewrite to empty: $full")
    // winnowed screen: the quote (>= win+k-1 = 54 bytes) is guaranteed
    // to flag its docs, so the two forms agree byte for byte
    val w = Corpus.decontaminateRewriteWinnowed(corpus, bench, "doc_id",
        "text", winBytes = 40, k = 15)
      .collect().map(x => x.getLong(0) -> x.toString).toMap
    assert(w == r.map { case (k, v) => k -> v.toString },
      s"winnowed $w != exact")
  }

  test("decontamMatrix: the verbatim-quote page fires spans and " +
      "containment but not fraction — the disagreement the card exists " +
      "to show; verdict algebra exact") {
    val quote = "the seventeen quick brown foxes jumped over the lazy sleeping dogs"
    val filler = (1 to 120).map(i => s"fill$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$filler $quote $filler"),
      (2L, s"completely unrelated page $filler")).toDF("doc_id", "text")
    val bench = Seq((100L, quote)).toDF("doc_id", "text")
    val m = Corpus.decontamMatrix(corpus, bench, "doc_id", "text",
        n = 2, fractionDropBp = 2500, containmentDropBp = 8000,
        winBytes = 40, anchorMod = 4, spanDropBp = 100)
      .collect().map(x => x.getLong(0) -> x).toMap
    val leak = m(1L)
    // quote bigrams are 10 of the page's ~250 distinct bigrams: the
    // fraction form dilutes below any usable threshold...
    assert(!leak.getAs[Boolean]("drop_fraction") &&
      leak.getAs[Long]("overlap_bp") < 1000, s"fraction must dilute: $leak")
    // ...while the whole eval item is contained (10000 bp) and the
    // exact span flags at its own policy
    assert(leak.getAs[Boolean]("drop_containment") &&
      leak.getAs[Long]("max_cont_bp") == 10000L, s"containment: $leak")
    assert(leak.getAs[Boolean]("drop_spans"), s"spans: $leak")
    assert(leak.getAs[Boolean]("drop_any") &&
      leak.getAs[Long]("n_forms") == 2L)
    val clean = m(2L)
    assert(!clean.getAs[Boolean]("drop_any") &&
      clean.getAs[Long]("n_forms") == 0L, s"clean page: $clean")
  }

  test("scoreCard: tie-aware AUC matches the pair-counting definition; " +
      "equal-mass bins and rates hand-computed; degenerate labels NULL") {
    import spark.implicits._
    // ties at 10 (one pos one neg) and at 20 (one pos two neg):
    // brute-force pair AUC = 0.78125 -> 7812 bp under integer div
    val docs = Seq(
      (1L, 10L, false), (2L, 10L, true), (3L, 20L, false), (4L, 30L, true),
      (5L, 5L, false), (6L, 40L, true), (7L, 20L, false), (8L, 20L, true))
      .toDF("id", "s", "y")
    val card = Corpus.scoreCard(docs, "s", "y", "id", nBins = 4)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(card.size == 4)
    assert(card.values.forall(_._7 == 7812L), s"auc: ${card.values.map(_._7)}")
    // bins over (s, id) order: (5,1),(10,1)|(10,2),(20,3)|(20,7),(20,8)|(30,4),(40,6)
    assert(card(1) == ((1, 2L, 0L, 0L, 5L, 10L, 7812L)))
    assert(card(2) == ((2, 2L, 1L, 5000L, 10L, 20L, 7812L)))
    assert(card(3) == ((3, 2L, 1L, 5000L, 20L, 20L, 7812L)))
    assert(card(4) == ((4, 2L, 2L, 10000L, 30L, 40L, 7812L)))
    // perfect and inverted rankings hit the bounds exactly
    val perfect = Seq((1L, 1L, false), (2L, 2L, true)).toDF("id", "s", "y")
    assert(Corpus.scoreCard(perfect, "s", "y", "id", 1)
      .select("auc_bp").as[Long].head == 10000L)
    val inverted = Seq((1L, 2L, false), (2L, 1L, true)).toDF("id", "s", "y")
    assert(Corpus.scoreCard(inverted, "s", "y", "id", 1)
      .select("auc_bp").as[Long].head == 0L)
    // degenerate: one class only -> NULL, not a fake 0.5
    val onlyPos = Seq((1L, 1L, true), (2L, 2L, true)).toDF("id", "s", "y")
    assert(Corpus.scoreCard(onlyPos, "s", "y", "id", 1)
      .select("auc_bp").as[Option[Long]].head.isEmpty)
  }

  test("scoreThresholds: keep-bins->=b operating points hand-computed; " +
      "no positives -> NULL recall") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L, false), (2L, 10L, true), (3L, 20L, false), (4L, 30L, true),
      (5L, 5L, false), (6L, 40L, true), (7L, 20L, false), (8L, 20L, true))
      .toDF("id", "s", "y")
    val got = Corpus.scoreThresholds(docs, "s", "y", "id", nBins = 4)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1) == ((1, 5L, 8L, 4L, 5000L, 10000L)))
    assert(got(2) == ((2, 10L, 6L, 4L, 6666L, 10000L)))
    assert(got(3) == ((3, 20L, 4L, 3L, 7500L, 7500L)))
    assert(got(4) == ((4, 30L, 2L, 2L, 10000L, 5000L)))
    val noPos = Corpus.scoreThresholds(
      Seq((1L, 1L, false), (2L, 2L, false)).toDF("id", "s", "y"),
      "s", "y", "id", nBins = 1)
      .select("recall_bp").as[Option[Long]].collect()
    assert(noPos.forall(_.isEmpty), "no positives must report NULL recall")
  }

  test("scoreCalibration: observed-vs-implied per equal-mass bin on a " +
      "tie-heavy prediction set, pooled ECE hand-computed; a perfectly " +
      "calibrated score reads zero") {
    import spark.implicits._
    // two massive prediction ties (2000 bp × 4 rows, 8000 bp × 4 rows):
    // the ntile splits ties by id, each bin's implied rate is exact
    val docs = Seq(
      (1L, 2000L, false), (2L, 2000L, true),
      (3L, 2000L, false), (4L, 2000L, false),
      (5L, 8000L, true), (6L, 8000L, true),
      (7L, 8000L, true), (8L, 8000L, false))
      .toDF("id", "p", "y")
    val got = Corpus.scoreCalibration(docs, "p", "y", "id", nBins = 4)
      .as[(Int, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // ECE = (2·3000 + 2·2000 + 2·2000 + 2·3000) / 8 = 2500 bp
    assert(got(1) == ((1, 2L, 1L, 5000L, 2000L, 2000L, 2000L, 3000L, 2500L)),
      s"bin1 ${got(1)}")
    assert(got(2) == ((2, 2L, 0L, 0L, 2000L, 2000L, 2000L, 2000L, 2500L)))
    assert(got(3) == ((3, 2L, 2L, 10000L, 8000L, 8000L, 8000L, 2000L, 2500L)))
    assert(got(4) == ((4, 2L, 1L, 5000L, 8000L, 8000L, 8000L, 3000L, 2500L)))
    // perfectly calibrated (deterministic 0/10000 predictions, labels
    // to match): every gap 0, pooled ECE 0
    val calib = Seq((1L, 0L, false), (2L, 10000L, true)).toDF("id", "p", "y")
    assert(Corpus.scoreCalibration(calib, "p", "y", "id", nBins = 2)
      .select("gap_bp", "ece_bp").as[(Long, Long)].collect()
      .forall(t => t._1 == 0L && t._2 == 0L))
  }

  test("langIdModel: beats the stopword/script heuristic on short " +
      "Latin-script docs the heuristic can only call 'und'") {
    val train = langSeeds.toDF("doc_id", "lang", "text")
    val model = Corpus.langIdTrain(train, "text", "lang")
    // short probes: no CJK script, near-zero English stopwords — the
    // heuristic's only possible verdicts here are 'en' or 'und'
    val probes = Seq(
      (100L, "de", "der faule hund springt über den braunen fuchs"),
      (101L, "fr", "le chien paresseux saute par dessus le renard brun"),
      (102L, "es", "el perro perezoso salta sobre el zorro marrón"),
      (103L, "en", "the lazy dog jumps over the brown fox"),
      (104L, "zh", "懒惰的狗跳过了棕色的狐狸")).toDF("doc_id", "truth", "text")
    val pred = Corpus.langIdPredict(probes, "doc_id", "text", model)
      .select(col("id"), col("pred_lang")).as[(Long, String)].collect().toMap
    val truth = Map(100L -> "de", 101L -> "fr", 102L -> "es",
      103L -> "en", 104L -> "zh")
    assert(pred == truth, s"model predictions $pred != $truth")
    val heur = probes.select(col("doc_id"),
        graft.ext.TextOps.langIdHeuristic(col("text")))
      .as[(Long, String)].collect().toMap
    // the heuristic gets zh (script) and en (stopwords) but CANNOT name
    // de/fr/es — the misclassifications the learned model exists to fix
    assert(Seq(100L, 101L, 102L).forall(id => heur(id) != truth(id)),
      s"fixture must be heuristic-hostile, got $heur")
    assert(heur(103L) == "en" && heur(104L) == "zh")
  }

  test("langIdModel: driver replay of logits — matched, unseen-default, " +
      "and prior terms bit-exact; sub-n docs absent") {
    val train = langSeeds.toDF("doc_id", "lang", "text")
    val nBuckets = 4096
    val modelDf = Corpus.langIdTrain(train, "text", "lang", 3, nBuckets)
      .cache()
    val model = modelDf.as[(Long, String, Long)].collect()
    val dense = model.filter(_._1 >= 0)
      .map { case (b, l, w) => (b, l) -> w }.toMap
    val w0 = model.filter(_._1 == -1L).map { case (_, l, w) => l -> w }.toMap
    val pri = model.filter(_._1 == -2L).map { case (_, l, w) => l -> w }.toMap
    val obs = dense.keys.map(_._1).toSet
    val langs = w0.keys.toSeq.sorted
    // one doc of seen text, one of gibberish trigrams (unseen default
    // path), one shorter than n=3 chars (must be absent)
    val probes = Seq((1L, "der schnelle fuchs"), (2L, "qqqq zzzz xxxx"),
      (3L, "ab")).toDF("doc_id", "text")
    def grams(t: String): Seq[String] = {
      val n = t.toLowerCase.trim.replaceAll("\\s+", " ")
      if (n.length < 3) Seq.empty
      else (0 to n.length - 3).map(i => n.substring(i, i + 3))
    }
    def bucket(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % nBuckets
    }
    def expect(t: String): Option[(String, Long)] = {
      val bs = grams(t).map(bucket)
      if (bs.isEmpty) None
      else Some(langs.map { l =>
        val s = bs.map(b =>
          if (obs.contains(b)) dense((b, l)) else w0(l)).sum
        (l, s + pri(l))
      }.maxBy { case (l, s) => (s, -langs.indexOf(l)) } match {
        case (l, s) => (l, s)
      })
    }
    val got = Corpus.langIdPredict(probes, "doc_id", "text", modelDf,
        3, nBuckets)
      .select(col("id"), col("pred_lang"), col("logit"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    modelDf.unpersist()
    assert(!got.contains(3L), "sub-n doc must be absent")
    for (id <- Seq(1L, 2L)) {
      val t = Seq("der schnelle fuchs", "qqqq zzzz xxxx")(id.toInt - 1)
      assert(got(id) == expect(t).get,
        s"doc $id: spark ${got(id)} != driver ${expect(t).get}")
    }
  }

  private val lineDocs = Seq(
    (1L, "Hello World\n\nBody one unique\nNav Menu 2024\n777"),
    (2L, "hello world\n\nBody two unique\nNav Menu 2025\n888"),
    (3L, "Body three unique\nNav Menu 9"),
    (4L, null.asInstanceOf[String]))

  test("cross-doc line dedup, CCNet first-occurrence form: case+digit " +
      "normalization collapses variants, global first (id, idx) keeps, " +
      "structural lines exempt, NULL text passes whole") {
    val df = lineDocs.toDF("doc_id", "text")
    val got = Corpus.lineDedupFirst(df, "doc_id", "text")
      .as[(Long, Option[String], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1 is entirely first occurrences (777 is structural: digit-
    // only normalizes to empty); doc 2 loses its header (dup of doc
    // 1's, case-folded) and its nav line (digits stripped: "Nav Menu
    // 2025" ≡ "Nav Menu 2024"); doc 3 loses only the nav line
    assert(got(1L) == ((Some("Hello World\n\nBody one unique\nNav Menu 2024\n777"), 5L, 0L)), s"doc1 ${got(1L)}")
    assert(got(2L) == ((Some("\nBody two unique\n888"), 5L, 2L)), s"doc2 ${got(2L)}")
    assert(got(3L) == ((Some("Body three unique"), 2L, 1L)), s"doc3 ${got(3L)}")
    assert(got(4L) == ((None, 0L, 0L)), s"doc4 ${got(4L)}")
  }

  test("cross-doc line dedup, boilerplate form: only lines above the " +
      "doc-frequency threshold are cut — from EVERY doc, no canonical " +
      "occurrence spared; under-threshold duplicates all survive") {
    val df = lineDocs.toDF("doc_id", "text")
    val got = Corpus.lineDedupBoilerplate(df, "doc_id", "text",
        maxDocFreq = 2)
      .as[(Long, Option[String], Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // nav menu df=3 > 2: cut everywhere. "hello world" df=2: kept in
    // BOTH docs (contrast the first-occurrence form). 777/888 exempt.
    assert(got(1L) == ((Some("Hello World\n\nBody one unique\n777"), 5L, 1L)), s"doc1 ${got(1L)}")
    assert(got(2L) == ((Some("hello world\n\nBody two unique\n888"), 5L, 1L)), s"doc2 ${got(2L)}")
    assert(got(3L) == ((Some("Body three unique"), 2L, 1L)), s"doc3 ${got(3L)}")
    assert(got(4L) == ((None, 0L, 0L)), s"doc4 ${got(4L)}")
  }
}
