package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compact.Compaction
import graft.envelope.{DmsCdc, MongoCdc, PgCdc}
import graft.ext.{Corpus, DataQuality, Dedup, Multimodal, Similarity, TextOps}

/** The end-to-end curation composites (prep v1/v2/v3), chunking,
  * packing (greedy + BPE-budgeted), decontamination (exact/Bloom/
  * fraction).
  *
  * One mixin slice of [[Queries]] — split mechanically from the former
  * single Queries.scala (no behavior change); mixin order in `object
  * Queries` preserves the original definition/initialization order.
  */
private[graft] trait QueriesComposites { this: Queries.type =>

  /** End-to-end training-corpus preparation — the composition story:
    * language/quality gate → exact-dedup survivors → per-source quota
    * balancing (portable-hash order) → per-source token budget. Every
    * stage is integer/string-deterministic, so the whole pipeline is
    * oracle-checked as one unit.
    */
  val qCorpusPrep = Q("q_corpus_prep",
    (s, dir) => Corpus.prepV1(t(s, dir, "documents"),
      "doc_id", "source", "text", quota = 30),
    Some(s"""WITH scored AS (
        SELECT doc_id, source,
          len(regexp_extract_all(text, '\\S+')) AS n_tokens,
          len(list_filter(regexp_extract_all(lower(text), '\\S+'),
              x -> x IN ($stopList))) AS n_stop,
          len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
          length(text) AS n_chars,
          CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
               WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]') THEN 'ru'
               WHEN regexp_matches(text, '[\\x{0600}-\\x{06ff}]') THEN 'ar'
               WHEN regexp_matches(text, '[\\x{0900}-\\x{097f}]') THEN 'hi'
               WHEN len(list_filter(regexp_extract_all(lower(text), '\\S+'),
                   x -> x IN ($stopList))) * 8 >= len(regexp_extract_all(text, '\\S+'))
                 THEN 'en'
               ELSE 'und' END AS lang_pred,
          md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM documents),
      q AS (
        SELECT *,
          (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 10
                WHEN n_tokens < 20 THEN n_tokens // 2
                ELSE 10000 // n_tokens END) * 5
          + least((n_stop * 50) // greatest(n_tokens, 1), 10) * 3
          + (10 - least((n_punct * 50) // greatest(n_chars, 1), 10)) * 2 AS quality
        FROM scored),
      kept AS (SELECT * FROM q WHERE lang_pred = 'en' AND quality >= 55),
      surv AS (
        SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keep_id
                       FROM kept) WHERE doc_id = keep_id),
      quota AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT,
                     doc_id) AS sample_rank
          FROM surv) WHERE sample_rank <= 30)
      SELECT source, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS budget_tokens
      FROM quota GROUP BY source"""))

  /** End-to-end training-corpus preparation — the composition story:
    * duplicated-span coverage gate ([[Dedup.substringDupCoverage]]) +
    * quality-classifier gate ([[Corpus.qualityScore]], mean hashed-
    * n-gram weight ≥ −2) → fraction decontamination vs a held-out
    * benchmark ([[Corpus.decontaminateFraction]]) → exact-dedup
    * survivors → temperature mixture rebalance at α = 0.5
    * ([[Corpus.temperatureSample]]) → per-source budgets in LEARNED
    * subword tokens ([[Bpe.learn]] on the raw corpus + [[Bpe.encode]]).
    * Six stages, one hash-matched oracle: every intermediate set and
    * the final per-source token budgets are pinned.
    *
    * Stage independence the oracle relies on: coverage, quality, and
    * per-doc overlap fractions are doc-local scores (a doc's verdict
    * does not depend on which OTHER docs survived earlier stages), so
    * the SQL computes them over the full table and intersects the keeps —
    * while the temperature RATES are derived from the survivors' own
    * per-source counts, exactly as the operator does on its input.
    * The coverage block inherits `dedup_substr_coverage`'s oracle-unit
    * caveat: char-replayed windows == the operator's byte scan on the
    * ASCII fixture; non-ASCII byte semantics are oracle-replayed
    * byte-for-byte by `dedup_substr_coverage_utf8` (hex-view windows)
    * and spec-pinned by the CJK battery.
    */
  val qCorpusPrepV2 = Q("q_corpus_prep_v2",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val covKeep = Dedup.substringDupCoverage(docs, "doc_id", "text",
          winBytes = 40, anchorMod = 8, dropAtBp = 5000)
        .filter(!col("drop")).select(col("id").as("doc_id"))
      // quality gate (fastText-style hashed-n-gram linear scorer, the
      // q_quality_score fixture weights): mean weight >= -2 admits the
      // bulk and trims the worst tail — doc-local like the coverage
      // gate, so the oracle computes both over the full table and
      // intersects the keeps
      val wTable = s.range(1024).select(col("id").as("bucket"),
        (pmod(graft.ext.TextOps.portableHash(col("id").cast("string")),
          lit(21L)) - 10).as("w"))
      val qualKeep = Corpus.qualityScore(docs, "doc_id", "text", wTable,
          nBuckets = 1024, thrMilli = -2000L)
        .filter(col("keep")).select(col("id").as("doc_id"))
      // cached: read by the decontamination stage AND the keep join
      val afterCov = graft.ext.Materialize.multiScan(
        docs.join(covKeep, Seq("doc_id")).join(qualKeep, Seq("doc_id")))
      val bench = docs.filter(col("doc_id") % 97 === 0)
      // trigrams, not bigrams: this corpus draws from a small
      // vocabulary, and at sf0.1 the benchmark's BIGRAM set covers
      // nearly the whole bigram space — every doc would exceed any
      // sane overlap threshold and the stage would empty the corpus
      val deconKeep = Corpus.decontaminateFraction(
          afterCov.filter(col("doc_id") % 97 =!= 0), bench,
          "doc_id", "text", n = 3, dropAtBp = 2500)
        .filter(!col("drop")).select(col("id").as("doc_id"))
      val afterDecon = afterCov.join(deconKeep, Seq("doc_id"))
      // cached: temperatureSample's rate collect and the final budget
      // aggregation would otherwise each re-run the whole gate prefix
      val surv = graft.ext.Materialize.multiScan(afterDecon
        .withColumn("fp", TextOps.fingerprint(col("text")))
        .withColumn("keep_id",
          min(col("doc_id")).over(Window.partitionBy(col("fp"))))
        .filter(col("doc_id") === col("keep_id")))
      val sampled = Corpus.temperatureSample(surv, "source",
        Seq("doc_id"), alpha = 0.5)
      val merges = graft.ext.Bpe.learn(docs, "text", nMerges = 8)
      sampled.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(graft.ext.Bpe.encode(col("text"), merges)))
            .cast("long").as("bpe_tokens"))
    },
    Some(bpeLearnCtes(8) + "," + bpeEncodeCtes + """,
      qw AS (SELECT i AS bucket,
          ('0x'||substr(md5(i::VARCHAR),1,15))::BIGINT % 21 - 10 AS w
        FROM range(0, 1024) t(i)),
      qd AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      qfeats AS (
        SELECT doc_id, unnest(toks) AS f FROM qd WHERE NOT toks = ['']
        UNION ALL
        SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS f
        FROM qd, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      qsc AS (
        SELECT fb.doc_id, count(*) AS nf,
          CAST(sum(coalesce(qw.w, 0)) AS BIGINT) AS logit
        FROM (SELECT doc_id,
                ('0x'||substr(md5(f),1,15))::BIGINT % 1024 AS bucket
              FROM qfeats) fb
        LEFT JOIN qw USING (bucket) GROUP BY fb.doc_id),
      qkeep AS (SELECT doc_id FROM qsc WHERE logit * 1000 >= -2000 * nf),
      cd AS (
        SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS t
        FROM documents),
      csized AS (
        SELECT doc_id, t, length(t) AS n FROM cd WHERE length(t) >= 40),
      cpos AS (
        SELECT doc_id, t, unnest(generate_series(1, n - 40 + 1)) AS p
        FROM csized),
      canch AS (
        SELECT doc_id, t, p FROM cpos
        WHERE (ascii(substr(t, p, 1)) * 4 + ascii(substr(t, p + 3, 1)) * 2
               + ascii(substr(t, p + 7, 1))) % 8 = 0),
      cwins AS (SELECT doc_id, p, md5(substr(t, p, 40)) AS fp FROM canch),
      cocc AS (
        SELECT doc_id, p, count(*) OVER (PARTITION BY fp) AS n_occ
        FROM cwins),
      cdup AS (SELECT doc_id, p FROM cocc WHERE n_occ >= 2),
      cmarked AS (
        SELECT doc_id, p,
          CASE WHEN p > coalesce(max(p + 40) OVER (PARTITION BY doc_id
            ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
          THEN 1 ELSE 0 END AS new_isl
        FROM cdup),
      cisl AS (
        SELECT doc_id, p,
          sum(new_isl) OVER (PARTITION BY doc_id ORDER BY p) AS isl_id
        FROM cmarked),
      cspans AS (
        SELECT doc_id, isl_id, min(p) AS s, max(p) + 40 AS e
        FROM cisl GROUP BY 1, 2),
      ccov AS (
        SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS covered_bytes
        FROM cspans GROUP BY 1),
      covkeep AS (
        SELECT b.doc_id
        FROM (SELECT doc_id,
                octet_length(encode(trim(regexp_replace(lower(text),'\s+',' ','g')))) AS nb
              FROM documents) b
        LEFT JOIN ccov c USING (doc_id)
        WHERE NOT ((CASE WHEN b.nb > 0
          THEN (coalesce(c.covered_bytes, 0) * 10000) // b.nb
          ELSE 0 END) >= 5000)),
      fsh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(
            len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' '))-2, 0)),
          i -> array_to_string(
            string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')[i:i+2], ' ')))
          AS sset
        FROM documents),
      fex0 AS (SELECT doc_id, unnest(sset) AS shingle FROM fsh),
      fex AS (SELECT doc_id,
                ('0x'||substr(md5(shingle),1,15))::BIGINT AS h
              FROM fex0),
      fbench AS (SELECT DISTINCT h FROM fex WHERE doc_id % 97 = 0),
      fscored AS (
        SELECT doc_id, count(*) AS n_shingles,
          count(CASE WHEN h IN (SELECT h FROM fbench) THEN 1 END) AS n_shared
        FROM fex WHERE doc_id % 97 <> 0 GROUP BY doc_id),
      deconkeep AS (
        SELECT k.doc_id
        FROM covkeep k JOIN qkeep USING (doc_id)
          LEFT JOIN fscored f USING (doc_id)
        WHERE k.doc_id % 97 <> 0
          AND NOT ((CASE WHEN coalesce(f.n_shingles, 0) > 0
            THEN (f.n_shared * 10000) // f.n_shingles ELSE 0 END) >= 2500)),
      surv AS (
        SELECT doc_id, source FROM (
          SELECT d.doc_id, d.source,
            min(d.doc_id) OVER (PARTITION BY
              md5(trim(regexp_replace(lower(d.text),'\s+',' ','g')))) AS keep_id
          FROM documents d JOIN deconkeep USING (doc_id))
        WHERE doc_id = keep_id),
      tc AS (SELECT source, count(*) AS n FROM surv GROUP BY source),
      tm AS (SELECT max(n) AS nmax FROM tc),
      tr AS (SELECT source,
        CAST(floor(sqrt(
          (((n::HUGEINT) * 1000000 * 1000000) // (SELECT nmax FROM tm))::DOUBLE))
          AS BIGINT) AS rate
        FROM tc),
      samp AS (
        SELECT sv.doc_id, sv.source
        FROM surv sv JOIN tr USING (source)
        WHERE ('0x'||substr(md5(sv.doc_id::VARCHAR),1,15))::BIGINT % 1000000
              < tr.rate)
      SELECT sp.source, count(*) AS n_docs,
        CAST(sum(coalesce(len(a.all_toks), 0)) AS BIGINT) AS bpe_tokens
      FROM samp sp LEFT JOIN agg a USING (doc_id)
      GROUP BY sp.source"""))

  /** Curation ladder v3 — the full published web-curation pipeline as
    * ONE composite with ONE end-to-end oracle, chaining the round-8
    * scorers the way a production corpus build runs them:
    *
    *   1. the FULL Gopher filter (Rae 2021) — shape battery AND
    *     repetition battery ([[Corpus.repetitionSignals]]), both
    *     doc-local gates;
    *   2. CCNet perplexity terciles (Wenzek 2020) — unigram-LM
    *     surprisal trained on the FULL corpus, ranked per source over
    *     the Gopher survivors via [[graft.ext.Prefix.stratifiedNtile]]
    *     (no ntile window — the q_perplexity_buckets scale shape),
    *     tail tercile dropped;
    *   3. DSIR Gumbel-top-k resampling (Xie 2023) — λ trained on the
    *     LADDER SURVIVOR pool vs the held-out benchmark slice (the
    *     ladder variant of [[dsirCtesNamed]]; benchmark docs are never
    *     selectable), top-100 by the exact fixed-point Gumbel key —
    *     a binding cut of the ~160-doc survivor pool at sf0.01, so the
    *     stochastic selection itself is exercised and pinned;
    *   4. temperature mixture rebalance at α = 0.5 (mT5) on the
    *     selected set's own per-source counts;
    *   5. contiguous packing budgeted in LEARNED BPE subword tokens
    *     (budget 2000, merges learned on the raw corpus — the shared
    *     unrolled CTEs).
    *
    * Rank-dependent stages (terciles, top-k, temperature rates) are
    * computed over the surviving set at that rung — exactly what the
    * oracle replays; doc-local scores (rules, surprisal, λ features)
    * compute over their defining corpus and intersect. Output is the
    * packed-corpus summary: every upstream admission decision moves
    * some pack's token count, so the hash pins the whole ladder.
    */
  val qCorpusPrepV3 = Q("q_corpus_prep_v3",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      // ONE normalize+tokenize pass shared by every full-corpus rung
      // (Gopher shape battery, repetition battery, surprisal, and both
      // DSIR feature sides) — the rungs consume it through their *On
      // share points, so the corpus is scanned/normalized once instead
      // of five times, and the spread fixes the single-split scan the
      // un-spread gopherRules path inherited on a one-file table
      val pre = graft.ext.Materialize.multiScan(
        graft.ext.Materialize.spread(docs)
          .select(col("doc_id").as("id"), col("source"),
            col("text").as("raw"),
            graft.ext.TextOps.normalized(col("text")).as("t"))
          .withColumn("ts", graft.ext.TextOps.tokens(col("t"))))
      // 1. the FULL Gopher filter — shape battery AND repetition battery,
      // both doc-local
      val gKeep = Corpus.gopherRulesOn(pre, 50, 100000,
          graft.ext.TextOps.Stopwords)
        .filter(col("keep")).select(col("id").as("doc_id"))
        // top-n-gram dials tightened to the corpus (the stoplist
        // precedent): Rae's web-text 20/18/16% coverages are vacuous on
        // a 2k-vocab synthetic corpus whose shape survivors top out
        // near 9%, so the published dials would gate nothing here —
        // 7/8/9% makes the rung BINDING (drops 40 of 234 at sf0.01),
        // which is what lets the end-to-end hash pin the wiring
        .join(Corpus.repetitionSignalsOn(pre,
            topNs = Seq(2, 3, 4), dupNs = Seq(5, 6, 7, 8, 9, 10),
            topBpMax = Map(2 -> 700L, 3 -> 800L, 4 -> 900L),
            dupBpMax = Map(5 -> 1500L, 6 -> 1400L, 7 -> 1300L,
              8 -> 1200L, 9 -> 1100L, 10 -> 1000L))
          .filter(col("keep")).select(col("id").as("doc_id")),
          Seq("doc_id"))
      // 2. per-source surprisal terciles over the Gopher survivors
      val surp = Corpus.unigramSurprisalOn(pre)
        .select(col("id").as("doc_id"), col("mean_surprisal_x10k"))
      val ranked = graft.ext.Prefix.stratifiedNtile(
        surp.join(gKeep, Seq("doc_id"))
          .join(pre.select(col("id").as("doc_id"), col("source")),
            Seq("doc_id")),
        Seq(col("source")),
        Seq(col("mean_surprisal_x10k"), col("doc_id")), 3, "bucket")
      val pKeep = ranked.filter(col("bucket") <= 2).select("doc_id")
      // 3. DSIR Gumbel-top-k: λ on the survivor pool, bench never
      // selectable — both feature sides reuse the shared token arrays
      val preTs = pre.select(col("id"), col("ts"))
      val sel = Corpus.dsirResampleOn(
          preTs.join(pKeep.select(col("doc_id").as("id")), Seq("id"))
            .filter(col("id") % 97 =!= 0),
          preTs.filter(col("id") % 97 === 0),
          k = 100, nBuckets = 1024)
        .select(col("id").as("doc_id"))
      // localCheckpoint, not persist: the selection is k rows (≤ 100),
      // and every downstream consumer (the temperature rate collect,
      // the pack prefix sum, the final aggregate) re-analyzed the ENTIRE
      // multi-rung lineage — thousands of plan nodes — per action; the
      // checkpoint truncates the plan at a k-row leaf, which is where
      // the composite's warm cost actually lived (driver analysis, not
      // tasks)
      val selSrc = sel.join(
          pre.select(col("id").as("doc_id"), col("source"),
            col("raw").as("text")),
          Seq("doc_id")).localCheckpoint()
      // 4. temperature rebalance on the selected set's source mix
      val sampled = Corpus.temperatureSample(selSrc, "source",
        Seq("doc_id"), alpha = 0.5)
      // 5. BPE-budgeted packing (merges from the raw corpus)
      val merges = graft.ext.Bpe.learn(docs, "text", nMerges = 8)
      Corpus.pack(sampled, "doc_id", "text", budget = 2000,
          tokenCounter = c => size(graft.ext.Bpe.encode(c, merges)))
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("pack_tokens"))
    },
    Some(bpeLearnCtes(8) + "," + bpeEncodeCtes + "," +
      repetitionCtes("r", top2Max = 700, top3Max = 800, top4Max = 900) + """,
      gd AS (
        SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS t
        FROM documents),
      gb AS (
        SELECT doc_id, t, string_split(t, ' ') AS toks,
          CASE WHEN t = '' THEN 0
               ELSE len(string_split(t, ' ')) END AS n
        FROM gd),
      gm AS (
        SELECT doc_id, CAST(n AS BIGINT) AS n_words,
          CASE WHEN n > 0
            THEN ((length(t) - (n - 1)) * 100) // n ELSE 0 END AS mean_len_x100,
          CASE WHEN n > 0 THEN
            (((length(t) - length(replace(t, '#', '')))
              + (length(t) - length(replace(t, '...', ''))) // 3) * 10000) // n
          ELSE 0 END AS symbol_bp,
          CASE WHEN n > 0 THEN
            (len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 10000) // n
          ELSE 0 END AS alpha_bp,
          CAST(len(list_intersect(list_distinct(toks),
            ['the','a','an','of','and','to','in','is','on','for','it',
             'with','as','at','by','be','this','that','from','or'])) AS BIGINT)
            AS n_stop_distinct
        FROM gb),
      gkeep AS (
        SELECT gm.doc_id FROM gm JOIN rbp USING (doc_id)
        WHERE (n_words BETWEEN 50 AND 100000)
          AND (mean_len_x100 BETWEEN 300 AND 1000)
          AND symbol_bp <= 1000 AND alpha_bp >= 8000
          AND n_stop_distinct >= 2 AND rbp.keep),
      ptok AS MATERIALIZED (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      pfreq AS (SELECT token, count(*) AS cnt FROM ptok GROUP BY 1),
      ptot AS (SELECT count(*) AS n_total FROM ptok),
      ppd AS (
        SELECT doc_id, CAST(sum(nat10k) AS BIGINT) // count(*) AS m
        FROM (
          SELECT t.doc_id,
            CAST(floor(-ln(f.cnt::DOUBLE / o.n_total) * 10000 + 0.5) AS BIGINT)
              AS nat10k
          FROM ptok t JOIN pfreq f USING (token) CROSS JOIN ptot o)
        GROUP BY doc_id),
      pranked AS (
        SELECT p.doc_id,
          ntile(3) OVER (PARTITION BY d.source
            ORDER BY p.m, p.doc_id) AS bucket
        FROM ppd p JOIN gkeep USING (doc_id)
          JOIN documents d USING (doc_id)),
      pkeep AS (SELECT doc_id FROM pranked WHERE bucket <= 2),
      """ + dsirCtesNamed("x",
        "SELECT xfb.* FROM xfb JOIN pkeep USING (doc_id) WHERE doc_id % 97 <> 0") + """,
      resamp AS (
        SELECT doc_id FROM (
          SELECT doc_id,
            dsir_x10k + CAST(floor(-ln(-ln(
              (('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT + 1.0)
                / 1152921504606846976.0)) * 10000 + 0.5) AS BIGINT) AS key_x10k
          FROM xscored)
        ORDER BY key_x10k DESC, doc_id LIMIT 100),
      tsrc AS (
        SELECT r.doc_id, d.source
        FROM resamp r JOIN documents d USING (doc_id)),
      tc AS (SELECT source, count(*) AS n FROM tsrc GROUP BY source),
      tm AS (SELECT max(n) AS nmax FROM tc),
      tr AS (SELECT source,
        CAST(floor(sqrt(
          (((n::HUGEINT) * 1000000 * 1000000) // (SELECT nmax FROM tm))::DOUBLE))
          AS BIGINT) AS rate
        FROM tc),
      samp AS (
        SELECT sv.doc_id
        FROM tsrc sv JOIN tr USING (source)
        WHERE ('0x'||substr(md5(sv.doc_id::VARCHAR),1,15))::BIGINT % 1000000
              < tr.rate),
      psz AS (
        SELECT s.doc_id, coalesce(len(a.all_toks), 0) AS n_tokens
        FROM samp s LEFT JOIN agg a USING (doc_id)),
      prn AS (
        SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM psz)
      SELECT CAST((cum - n_tokens) // 2000 AS BIGINT) AS pack_id,
        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      FROM prn GROUP BY 1"""))

  /** Curation ladder v4 — Lee et al. 2022's actual DEPLOYMENT shape for
    * the exact-substring cut ([[graft.ext.Dedup.exactSpanRewrite]]):
    * policy-filter FIRST (the Gopher shape battery, doc-local), run the
    * recall=1 every-offset cut on the SURVIVING slice only (the exact
    * pass's honest n-windows-per-n-bytes price is paid on the
    * policy-filtered corpus, not the raw one — SCALE.md's prescribed
    * operating point), then pack the REWRITTEN bytes into fixed byte
    * budgets for training. One end-to-end hash row: the oracle replays
    * the shape gates, the every-offset canonical-first rewrite, and the
    * byte-budget packing, so the composite's wiring — filter feeding
    * cut feeding pack — is what the hash pins.
    *
    * Scale shape: rung 1 is a stateless scan; rung 2 is the documented
    * exact-pass machinery (digest-only shuffles, parallelism ∝ docs) on
    * the reduced slice; rung 3 is [[graft.ext.Prefix.globalRunningSum]]
    * — no single-partition window. The rewrite relation is cached once
    * and read by both the pack sizing and the per-pack cut audit.
    */
  val qCorpusPrepV4 = Q("q_corpus_prep_v4",
    (s, dir) => Corpus.prepV4(t(s, dir, "documents"), "doc_id", "text",
      stopwords = graft.ext.TextOps.Stopwords),
    Some("""WITH gd AS (
        SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS t
        FROM documents),
      gb AS (
        SELECT doc_id, t, string_split(t, ' ') AS toks,
          CASE WHEN t = '' THEN 0
               ELSE len(string_split(t, ' ')) END AS n
        FROM gd),
      gm AS (
        SELECT doc_id, CAST(n AS BIGINT) AS n_words,
          CASE WHEN n > 0
            THEN ((length(t) - (n - 1)) * 100) // n ELSE 0 END AS mean_len_x100,
          CASE WHEN n > 0 THEN
            (((length(t) - length(replace(t, '#', '')))
              + (length(t) - length(replace(t, '...', ''))) // 3) * 10000) // n
          ELSE 0 END AS symbol_bp,
          CASE WHEN n > 0 THEN
            (len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) * 10000) // n
          ELSE 0 END AS alpha_bp,
          CAST(len(list_intersect(list_distinct(toks),
            ['the','a','an','of','and','to','in','is','on','for','it',
             'with','as','at','by','be','this','that','from','or'])) AS BIGINT)
            AS n_stop_distinct
        FROM gb),
      gkeep AS (
        SELECT doc_id FROM gm
        WHERE (n_words BETWEEN 50 AND 100000)
          AND (mean_len_x100 BETWEEN 300 AND 1000)
          AND symbol_bp <= 1000 AND alpha_bp >= 8000
          AND n_stop_distinct >= 2),
      d AS (SELECT gd.doc_id, gd.t FROM gd JOIN gkeep USING (doc_id)),
      sized AS (SELECT doc_id, t, length(t) AS n FROM d),
      pos AS (
        SELECT doc_id, t, unnest(generate_series(1, n - 40 + 1)) AS p
        FROM sized WHERE n >= 40),
      wins AS (SELECT doc_id, p, md5(substr(t, p, 40)) AS fp FROM pos),
      occ AS (
        SELECT doc_id, p, count(*) OVER (PARTITION BY fp) AS n_occ,
               row_number() OVER (PARTITION BY fp
                 ORDER BY doc_id, p) AS rn
        FROM wins),
      dup AS (SELECT doc_id, p FROM occ WHERE n_occ >= 2 AND rn > 1),
      marked AS (
        SELECT doc_id, p,
          CASE WHEN p > coalesce(max(p + 40) OVER (PARTITION BY doc_id
            ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
          THEN 1 ELSE 0 END AS new_isl
        FROM dup),
      isl AS (
        SELECT doc_id, p,
          sum(new_isl) OVER (PARTITION BY doc_id ORDER BY p) AS isl_id
        FROM marked),
      spans AS (
        SELECT doc_id, isl_id, min(p) AS s, max(p) + 40 AS e
        FROM isl GROUP BY 1, 2),
      head AS (
        SELECT doc_id,
          coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS seg_s,
          s AS seg_e
        FROM spans),
      cuts AS (
        SELECT doc_id, max(e) AS last_e, count(*) AS n_spans_cut,
               CAST(sum(e - s) AS BIGINT) AS cut_bytes
        FROM spans GROUP BY 1),
      tail AS (
        SELECT c.doc_id, c.last_e AS seg_s, z.n + 1 AS seg_e
        FROM cuts c JOIN sized z USING (doc_id)),
      segs AS (SELECT * FROM head UNION ALL SELECT * FROM tail),
      clean AS (
        SELECT g.doc_id,
          string_agg(substr(z.t, g.seg_s, g.seg_e - g.seg_s), ''
            ORDER BY g.seg_s) AS ct
        FROM segs g JOIN sized z USING (doc_id)
        WHERE g.seg_e > g.seg_s GROUP BY g.doc_id),
      rw AS (
        SELECT d.doc_id,
          coalesce(c.cut_bytes, 0) AS cut_bytes,
          CAST(length(CASE WHEN c.doc_id IS NOT NULL
            THEN coalesce(cl.ct, '') ELSE d.t END) AS BIGINT) AS clean_bytes
        FROM d LEFT JOIN cuts c USING (doc_id)
        LEFT JOIN clean cl ON cl.doc_id = d.doc_id),
      prn AS (
        SELECT doc_id, cut_bytes, clean_bytes,
          sum(clean_bytes) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM rw)
      SELECT CAST((cum - clean_bytes) // 4000 AS BIGINT) AS pack_id,
        count(*) AS n_docs, CAST(sum(clean_bytes) AS BIGINT) AS pack_bytes,
        CAST(sum(cut_bytes) AS BIGINT) AS cut_bytes
      FROM prn GROUP BY 1"""))

  /** Overlapping token-window chunking (size 40, overlap 8). */
  val qChunk = Q("q_chunk",
    (s, dir) => Corpus.chunk(t(s, dir, "documents"), "doc_id", "text",
        chunkSize = 40, overlap = 8)
      .select(col("id").as("doc_id"), col("chunk_no"), col("tok_start"),
        md5(col("chunk_text")).as("chunk_fp")),
    Some("""WITH d AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      sized AS (
        SELECT doc_id, toks,
          CASE WHEN toks = [''] THEN 0 ELSE len(toks) END AS n
        FROM d),
      chunked AS (
        SELECT doc_id, toks,
          greatest(CAST(ceil((n - 8) / 32.0) AS INT), 1) AS n_chunks
        FROM sized WHERE n > 0)
      SELECT doc_id, c.chunk_no, c.chunk_no * 32 + 1 AS tok_start,
        md5(array_to_string(toks[c.chunk_no*32+1 : c.chunk_no*32+40], ' ')) AS chunk_fp
      FROM chunked, LATERAL (
        SELECT unnest(generate_series(0, n_chunks - 1)) AS chunk_no) c"""))

  /** Contiguous sequence packing, budgeted in LEARNED BPE subword
    * tokens instead of whitespace tokens — the form a tokenizer-aware
    * training pipeline actually ships (context windows are subword
    * budgets). Exercises `pack`'s pluggable tokenCounter with
    * [[graft.ext.Bpe.encode]] on the corpus-learned table end-to-end;
    * the oracle replays learning + encoding (the shared unrolled CTEs)
    * and then the same running-sum pack assignment.
    */
  val qPackBpe = Q("q_pack_bpe",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.ext.Bpe.learn(docs, "text", nMerges = 8)
      Corpus.pack(docs, "doc_id", "text", budget = 2000,
          tokenCounter = c => size(graft.ext.Bpe.encode(c, merges)))
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("pack_tokens"))
    },
    Some(bpeLearnCtes(8) + "," + bpeEncodeCtes + """,
      psized AS (
        SELECT doc_id, coalesce(len(a.all_toks), 0) AS n_tokens
        FROM documents LEFT JOIN agg a USING (doc_id)),
      pruns AS (
        SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM psized)
      SELECT CAST((cum - n_tokens) // 2000 AS BIGINT) AS pack_id,
        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      FROM pruns GROUP BY 1"""))

  /** Contiguous sequence packing into 2000-token budgets. */
  val qPack = Q("q_pack",
    (s, dir) => Corpus.pack(t(s, dir, "documents"), "doc_id", "text",
        budget = 2000)
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("pack_tokens")),
    Some("""WITH toks AS (
        SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
        FROM documents),
      runs AS (
        SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM toks)
      SELECT CAST((cum - n_tokens) // 2000 AS BIGINT) AS pack_id,
        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      FROM runs GROUP BY 1"""))

  /** Packing-efficiency card ([[Corpus.packStats]]) over the same
    * 2000-token pack run as `q_pack`: global fill rate, packs pushed
    * past the budget by straddling docs, docs that can never fit. The
    * utilization answer a pipeline wants BEFORE committing a context
    * budget.
    */
  val qPackStats = Q("q_pack_stats",
    (s, dir) => Corpus.packStats(
      Corpus.pack(t(s, dir, "documents"), "doc_id", "text",
        budget = 2000), budget = 2000),
    Some("""WITH toks AS (
        SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
        FROM documents),
      runs AS (
        SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM toks),
      packs AS (
        SELECT (cum - n_tokens) // 2000 AS pack_id, count(*) AS docs,
          sum(n_tokens) AS tok,
          count(CASE WHEN n_tokens > 2000 THEN 1 END) AS oversize
        FROM runs GROUP BY 1)
      SELECT CAST(sum(docs) AS BIGINT) AS n_docs,
        count(*) AS n_packs,
        CAST(sum(tok) AS BIGINT) AS total_tokens,
        CAST((sum(tok) * 10000) // (count(*) * 2000) AS BIGINT) AS fill_bp,
        CAST(count(CASE WHEN tok > 2000 THEN 1 END) AS BIGINT)
          AS n_over_budget,
        CAST(sum(oversize) AS BIGINT) AS n_oversize_docs
      FROM packs"""))

  /** Score-ordered packing ([[Corpus.packOrdered]]): the q_pack run
    * refilled in (n_tokens desc, doc_id) order — length-grouped
    * batching at pack granularity. Same budget arithmetic, different
    * permutation; the full per-pack relation is pinned.
    */
  val qPackSorted = Q("q_pack_sorted",
    (s, dir) => Corpus.packOrdered(t(s, dir, "documents"), "doc_id",
        "text", budget = 2000,
        order = Seq(col("n_tokens").desc, col("id")))
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("pack_tokens")),
    Some("""WITH toks AS (
        SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
        FROM documents),
      runs AS (
        SELECT doc_id, n_tokens,
          sum(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM toks)
      SELECT CAST((cum - n_tokens) // 2000 AS BIGINT) AS pack_id,
        count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
      FROM runs GROUP BY 1"""))

  /** Content-set digest per source ([[Corpus.corpusDigest]]): XOR of
    * distinct 60-bit content hashes + counts — the O(1)
    * release-equality check, incremental under adds/removes. */
  val qCorpusDigest = Q("q_corpus_digest",
    (s, dir) => Corpus.corpusDigest(t(s, dir, "documents"),
      "text", "source"),
    Some("""WITH f AS (
        SELECT source,
          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        FROM documents),
      g AS (SELECT source, fp, count(*) AS n FROM f GROUP BY 1, 2)
      SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
        count(*) AS n_distinct,
        bit_xor(('0x'||substr(md5(fp),1,15))::BIGINT) AS digest60
      FROM g GROUP BY source"""))

  /** Benchmark decontamination: flag corpus docs sharing any 5-gram with
    * the benchmark set (stand-in: every 97th document). */
  val qDecontam = Q("q_decontam",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Corpus.decontaminate(docs.filter(col("doc_id") % 97 =!= 0), bench,
          "doc_id", "text", n = 5)
        .select(col("id").as("doc_id"), col("n_shared"))
    },
    Some("""WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(
            len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' '))-4, 0)),
          i -> array_to_string(
            string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')[i:i+4], ' ')))
          AS sset
        FROM documents),
      ex AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
      bench AS (SELECT DISTINCT shingle FROM ex WHERE doc_id % 97 = 0),
      corpus AS (SELECT doc_id, shingle FROM ex WHERE doc_id % 97 <> 0)
      SELECT c.doc_id, count(*) AS n_shared
      FROM corpus c WHERE c.shingle IN (SELECT shingle FROM bench)
      GROUP BY c.doc_id"""))

  /** Bloom-accelerated decontamination: BoomAgg-built filter prunes the
    * corpus postings inside the scan stage, exact semi-join restores
    * exactness — so the oracle is the SAME SQL as q_decontam, and a hash
    * match proves the bloom path changes nothing but the plan.
    */
  val qDecontamBloom = Q("q_decontam_bloom",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 97 === 0)
      Corpus.decontaminateBloom(docs.filter(col("doc_id") % 97 =!= 0), bench,
          "doc_id", "text", n = 5, nBits = 1 << 20, k = 5)
        .select(col("id").as("doc_id"), col("n_shared"))
    },
    Some("""WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(
            len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' '))-4, 0)),
          i -> array_to_string(
            string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')[i:i+4], ' ')))
          AS sset
        FROM documents),
      ex AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
      bench AS (SELECT DISTINCT shingle FROM ex WHERE doc_id % 97 = 0),
      corpus AS (SELECT doc_id, shingle FROM ex WHERE doc_id % 97 <> 0)
      SELECT c.doc_id, count(*) AS n_shared
      FROM corpus c WHERE c.shingle IN (SELECT shingle FROM bench)
      GROUP BY c.doc_id"""))

}
