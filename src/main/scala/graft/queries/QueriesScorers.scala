package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compact.Compaction
import graft.envelope.{DmsCdc, MongoCdc, PgCdc}
import graft.ext.{Corpus, DataQuality, Dedup, Multimodal, Similarity, TextOps}

/** LM scorers and curation filters: unigram/bigram/backoff surprisal,
  * fastText-style quality, DSIR select/resample, CCNet perplexity
  * buckets, Gopher rule + repetition batteries.
  *
  * One mixin slice of [[Queries]] — split mechanically from the former
  * single Queries.scala (no behavior change); mixin order in `object
  * Queries` preserves the original definition/initialization order.
  */
private[graft] trait QueriesScorers { this: Queries.type =>

  /** Unigram-LM surprisal scoring (the perplexity-filter shape). Fixed-
    * point integer surprisal per token before any unordered aggregate,
    * so the oracle hash-matches exactly.
    */
  val qLmSurprisal = Q("q_lm_surprisal",
    (s, dir) => Corpus.unigramSurprisal(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_tok"),
        col("surprisal_x10k"), col("mean_surprisal_x10k")),
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
      tot AS (SELECT count(*) AS n_total FROM tok),
      scored AS (
        SELECT t.doc_id,
          CAST(floor(-ln(f.cnt::DOUBLE / o.n_total) * 10000 + 0.5) AS BIGINT)
            AS nat10k
        FROM tok t JOIN freq f USING (token) CROSS JOIN tot o)
      SELECT doc_id, count(*) AS n_tok,
        CAST(sum(nat10k) AS BIGINT) AS surprisal_x10k,
        CAST(sum(nat10k) AS BIGINT) // count(*) AS mean_surprisal_x10k
      FROM scored GROUP BY doc_id"""))

  /** Frozen-LM surprisal — [[Corpus.surprisalAgainst]] as an oracle
    * row: the LM is trained on one slice (doc_id % 3 ≠ 0) and a
    * DISJOINT slice is scored against it, so the score of a document
    * provably does not depend on what it is scored with — the
    * decoupling the streaming admission loop relies on. Unseen tokens
    * (the scored slice's vocabulary tail) take the configured rare
    * price, exercised here by construction.
    */
  val qSurprisalFrozen = Q("q_surprisal_frozen",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val lm = Corpus.unigramLm(docs.filter(col("doc_id") % 3 =!= 0),
        "doc_id", "text")
      Corpus.surprisalAgainst(docs.filter(col("doc_id") % 3 === 0), lm,
          "doc_id", "text", unseenNat10k = 200000L)
        .select(col("id").as("doc_id"), col("n_tok"),
          col("surprisal_x10k"), col("mean_surprisal_x10k"))
    },
    Some("""WITH ttok AS (
        SELECT unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents WHERE doc_id % 3 <> 0),
      freq AS (SELECT token, count(*) AS cnt FROM ttok GROUP BY 1),
      tot AS (SELECT count(*) AS n_total FROM ttok),
      lm AS (
        SELECT token,
          CAST(floor(-ln(cnt::DOUBLE / n_total) * 10000 + 0.5) AS BIGINT)
            AS nat10k
        FROM freq CROSS JOIN tot),
      stok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents WHERE doc_id % 3 = 0),
      scored AS (
        SELECT s.doc_id, coalesce(lm.nat10k, 200000) AS nat10k
        FROM stok s LEFT JOIN lm USING (token))
      SELECT doc_id, count(*) AS n_tok,
        CAST(sum(nat10k) AS BIGINT) AS surprisal_x10k,
        CAST(sum(nat10k) AS BIGINT) // count(*) AS mean_surprisal_x10k
      FROM scored GROUP BY doc_id"""))

  /** Bigram-LM surprisal: conditional −ln p(t2|t1) under the corpus's
    * own bigram counts — context totals derived from the bigram counts,
    * fixed-point before the per-doc sum, <2-token docs drop out.
    */
  val qLmBigram = Q("q_lm_bigram",
    (s, dir) => Corpus.bigramSurprisal(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_bigrams"),
        col("surprisal_x10k"), col("mean_surprisal_x10k")),
    Some("""WITH d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      bg AS (
        SELECT doc_id, toks[g.i] AS t1, toks[g.i + 1] AS t2
        FROM d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      c2 AS (SELECT t1, t2, count(*) AS c2 FROM bg GROUP BY 1, 2),
      c1 AS (SELECT t1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      scored AS (
        SELECT bg.doc_id,
          CAST(floor(-ln(c2.c2::DOUBLE / c1.c1) * 10000 + 0.5) AS BIGINT)
            AS nat10k
        FROM bg JOIN c2 USING (t1, t2) JOIN c1 USING (t1))
      SELECT doc_id, count(*) AS n_bigrams,
        CAST(sum(nat10k) AS BIGINT) AS surprisal_x10k,
        CAST(sum(nat10k) AS BIGINT) // count(*) AS mean_surprisal_x10k
      FROM scored GROUP BY doc_id"""))

  /** Stupid Backoff trigram LM surprisal (Brants et al. 2007): the
    * trigram→bigram→unigram ladder with fixed α = 0.4, count cutoff 2
    * (without a cutoff, a self-trained corpus never backs off — every
    * observed trigram has c ≥ 1). No normalization means no per-context
    * discount pass, which is exactly what keeps the score one unordered
    * aggregation and fixed-point oracle-able; backoff-level tallies make
    * a regression visible at the level it happened.
    */
  val qLmBackoff = Q("q_lm_backoff",
    (s, dir) => Corpus.backoffSurprisal(t(s, dir, "documents"), "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_trigrams"), col("n_tri_hits"),
        col("n_bi_backoff"), col("n_uni_backoff"),
        col("surprisal_x10k"), col("mean_surprisal_x10k")),
    Some("""WITH d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      uni AS (SELECT t, count(*) AS cu FROM (
          SELECT unnest(toks) AS t FROM d WHERE NOT toks = ['']) GROUP BY 1),
      tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_total FROM uni),
      bi AS (SELECT a, b, count(*) AS cb FROM (
          SELECT toks[g.i] AS a, toks[g.i + 1] AS b
          FROM d, LATERAL (
            SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
          WHERE NOT toks = ['']) GROUP BY 1, 2),
      tg AS (
        SELECT doc_id, toks[g.i] AS t1, toks[g.i + 1] AS t2,
               toks[g.i + 2] AS t3
        FROM d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 2)) AS i) g
        WHERE NOT toks = ['']),
      tri AS (SELECT t1, t2, t3, count(*) AS ct FROM tg GROUP BY 1, 2, 3),
      scored AS (
        SELECT tg.doc_id,
          CASE WHEN tri.ct >= 2 THEN 3 WHEN b2.cb >= 2 THEN 2
               ELSE 1 END AS lvl,
          CAST(floor(-ln(
            CASE WHEN tri.ct >= 2 THEN tri.ct::DOUBLE / b1.cb
                 WHEN b2.cb >= 2 THEN 0.4 * b2.cb / u2.cu
                 ELSE 0.16 * u3.cu / o.n_total END) * 10000 + 0.5) AS BIGINT)
            AS nat10k
        FROM tg
        JOIN tri USING (t1, t2, t3)
        JOIN bi b1 ON b1.a = tg.t1 AND b1.b = tg.t2
        JOIN bi b2 ON b2.a = tg.t2 AND b2.b = tg.t3
        JOIN uni u2 ON u2.t = tg.t2
        JOIN uni u3 ON u3.t = tg.t3
        CROSS JOIN tot o)
      SELECT doc_id, count(*) AS n_trigrams,
        CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hits,
        CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi_backoff,
        CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni_backoff,
        CAST(sum(nat10k) AS BIGINT) AS surprisal_x10k,
        CAST(sum(nat10k) AS BIGINT) // count(*) AS mean_surprisal_x10k
      FROM scored GROUP BY doc_id"""))

  /** fastText-style quality-classifier scoring: hashed unigram+bigram
    * features, fixed integer weight table (here hash-derived so the
    * oracle replays generation → lookup → sum end-to-end), exact
    * integer logits. The keep verdict thresholds the MEAN weight at 0
    * by integer cross-multiply — no float anywhere.
    */
  val qQualityScore = Q("q_quality_score",
    (s, dir) => {
      val w = s.range(1024).select(col("id").as("bucket"),
        (pmod(graft.ext.TextOps.portableHash(col("id").cast("string")),
          lit(21L)) - 10).as("w"))
      Corpus.qualityScore(t(s, dir, "documents"), "doc_id", "text", w,
          nBuckets = 1024, thrMilli = 0L)
        .select(col("id").as("doc_id"), col("n_features"),
          col("logit"), col("keep"))
    },
    Some("""WITH d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      w AS (SELECT i AS bucket,
          ('0x'||substr(md5(i::VARCHAR),1,15))::BIGINT % 21 - 10 AS w
        FROM range(0, 1024) t(i)),
      feats AS (
        SELECT doc_id, unnest(toks) AS f FROM d WHERE NOT toks = ['']
        UNION ALL
        SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS f
        FROM d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      fb AS (SELECT doc_id,
          ('0x'||substr(md5(f),1,15))::BIGINT % 1024 AS bucket FROM feats),
      scored AS (
        SELECT fb.doc_id, count(*) AS n_features,
          CAST(sum(coalesce(w.w, 0)) AS BIGINT) AS logit
        FROM fb LEFT JOIN w USING (bucket) GROUP BY fb.doc_id)
      SELECT doc_id, n_features, logit,
        logit * 1000 >= 0 * n_features AS keep
      FROM scored"""))

  /** Score-quality card ([[Corpus.scoreCard]]): exact tie-aware AUC
    * (Mann-Whitney rank-sum, integer 2·avgRank form) + equal-mass lift
    * bins for the quality-classifier logit against the lang = 'en'
    * label — the "is this gate's threshold meaningful" measurement.
    * The oracle replays the scorer (the q_quality_score CTEs), the
    * per-distinct-score cumulative ranks, the AUC division in HUGEINT,
    * and the bins via DuckDB's NATIVE ntile over the same
    * (score, id) order — independently cross-checking
    * [[graft.ext.Prefix.stratifiedNtile]]'s closed form (the q_kfold
    * convention).
    */
  val qScoreCard = Q("q_score_card",
    (s, dir) => {
      val w = s.range(1024).select(col("id").as("bucket"),
        (pmod(graft.ext.TextOps.portableHash(col("id").cast("string")),
          lit(21L)) - 10).as("w"))
      val docs = t(s, dir, "documents")
      val scored = Corpus.qualityScore(docs, "doc_id", "text", w,
        nBuckets = 1024, thrMilli = 0L)
      Corpus.scoreCard(
        scored.join(docs.select(col("doc_id").as("id"),
          (col("lang") === "en").as("is_en")), Seq("id")),
        "logit", "is_en", "id", nBins = 10)
    },
    Some("""WITH d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      w AS (SELECT i AS bucket,
          ('0x'||substr(md5(i::VARCHAR),1,15))::BIGINT % 21 - 10 AS w
        FROM range(0, 1024) t(i)),
      feats AS (
        SELECT doc_id, unnest(toks) AS f FROM d WHERE NOT toks = ['']
        UNION ALL
        SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS f
        FROM d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      fb AS (SELECT doc_id,
          ('0x'||substr(md5(f),1,15))::BIGINT % 1024 AS bucket FROM feats),
      scored AS (
        SELECT fb.doc_id, CAST(sum(coalesce(w.w, 0)) AS BIGINT) AS logit
        FROM fb LEFT JOIN w USING (bucket) GROUP BY fb.doc_id),
      lab AS (SELECT s.doc_id AS id, s.logit, (dd.lang = 'en') AS y
              FROM scored s JOIN documents dd USING (doc_id)),
      binned AS (SELECT id, logit, y,
          CAST(ntile(10) OVER (ORDER BY logit, id) AS INTEGER) AS bin
        FROM lab),
      per AS (SELECT logit AS sv, count(*) AS cnt,
               sum(CASE WHEN y THEN 1 ELSE 0 END) AS np
             FROM lab GROUP BY 1),
      cums AS (SELECT sv, cnt, np, sum(cnt) OVER (ORDER BY sv) AS cum
              FROM per),
      auc AS (SELECT CAST(CASE
               WHEN sum(np) > 0 AND sum(cnt - np) > 0 THEN
                 (sum(np * (2 * cum - cnt + 1)) - sum(np) * (sum(np) + 1))
                   * 10000 // (2 * sum(np) * sum(cnt - np))
             END AS BIGINT) AS auc_bp FROM cums)
      SELECT b.bin, count(*) AS n,
        CAST(sum(CASE WHEN b.y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        CAST(sum(CASE WHEN b.y THEN 1 ELSE 0 END) * 10000 // count(*)
          AS BIGINT) AS pos_bp,
        min(b.logit) AS score_min, max(b.logit) AS score_max, a.auc_bp
      FROM binned b CROSS JOIN auc a
      GROUP BY b.bin, a.auc_bp"""))

  /** Threshold sweep ([[Corpus.scoreThresholds]]): per equal-mass bin,
    * the operating point of "keep bins ≥ b" — kept volume/positives,
    * precision and recall in exact bp — the table a gate threshold is
    * picked from. The oracle replays the scorer, the native-ntile
    * bins, and the suffix sums via a bin self-join.
    */
  val qScoreThresholds = Q("q_score_thresholds",
    (s, dir) => {
      val w = s.range(1024).select(col("id").as("bucket"),
        (pmod(graft.ext.TextOps.portableHash(col("id").cast("string")),
          lit(21L)) - 10).as("w"))
      val docs = t(s, dir, "documents")
      val scored = Corpus.qualityScore(docs, "doc_id", "text", w,
        nBuckets = 1024, thrMilli = 0L)
      Corpus.scoreThresholds(
        scored.join(docs.select(col("doc_id").as("id"),
          (col("lang") === "en").as("is_en")), Seq("id")),
        "logit", "is_en", "id", nBins = 10)
    },
    Some("""WITH d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      w AS (SELECT i AS bucket,
          ('0x'||substr(md5(i::VARCHAR),1,15))::BIGINT % 21 - 10 AS w
        FROM range(0, 1024) t(i)),
      feats AS (
        SELECT doc_id, unnest(toks) AS f FROM d WHERE NOT toks = ['']
        UNION ALL
        SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS f
        FROM d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      fb AS (SELECT doc_id,
          ('0x'||substr(md5(f),1,15))::BIGINT % 1024 AS bucket FROM feats),
      scored AS (
        SELECT fb.doc_id, CAST(sum(coalesce(w.w, 0)) AS BIGINT) AS logit
        FROM fb LEFT JOIN w USING (bucket) GROUP BY fb.doc_id),
      lab AS (SELECT s.doc_id AS id, s.logit, (dd.lang = 'en') AS y
              FROM scored s JOIN documents dd USING (doc_id)),
      binned AS (SELECT id, logit, y,
          CAST(ntile(10) OVER (ORDER BY logit, id) AS INTEGER) AS bin
        FROM lab),
      bins AS (SELECT bin, count(*) AS n,
               sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
               min(logit) AS score_min
             FROM binned GROUP BY 1),
      tot AS (SELECT CAST(sum(np) AS BIGINT) AS total_pos FROM bins)
      SELECT t.bin, t.score_min,
        CAST(sum(u.n) AS BIGINT) AS n_kept,
        CAST(sum(u.np) AS BIGINT) AS n_pos_kept,
        CAST(sum(u.np) * 10000 // sum(u.n) AS BIGINT) AS precision_bp,
        CAST(CASE WHEN x.total_pos > 0
          THEN sum(u.np) * 10000 // x.total_pos END AS BIGINT) AS recall_bp
      FROM bins t JOIN bins u ON u.bin >= t.bin CROSS JOIN tot x
      GROUP BY t.bin, t.score_min, x.total_pos"""))

  /** Calibration card ([[Corpus.scoreCalibration]]): per equal-mass
    * bin, observed vs implied positive rate + pooled ECE, for a
    * probability-scaled score — the fixture maps the quality logit
    * through a fixed monotone bp squash (5000 + 100·logit, clamped to
    * [0, 10000]) so the "implied rate" axis is deterministic and
    * integer. The oracle replays the scorer, the squash, the
    * native-ntile bins, and the gap/ECE arithmetic.
    */
  val qScoreCalibration = Q("q_score_calibration",
    (s, dir) => {
      val w = s.range(1024).select(col("id").as("bucket"),
        (pmod(graft.ext.TextOps.portableHash(col("id").cast("string")),
          lit(21L)) - 10).as("w"))
      val docs = t(s, dir, "documents")
      val scored = Corpus.qualityScore(docs, "doc_id", "text", w,
        nBuckets = 1024, thrMilli = 0L)
      Corpus.scoreCalibration(
        scored.join(docs.select(col("doc_id").as("id"),
            (col("lang") === "en").as("is_en")), Seq("id"))
          .withColumn("pred_bp",
            least(greatest(lit(5000L) + col("logit") * 100, lit(0L)),
              lit(10000L))),
        "pred_bp", "is_en", "id", nBins = 10)
    },
    Some("""WITH d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents),
      w AS (SELECT i AS bucket,
          ('0x'||substr(md5(i::VARCHAR),1,15))::BIGINT % 21 - 10 AS w
        FROM range(0, 1024) t(i)),
      feats AS (
        SELECT doc_id, unnest(toks) AS f FROM d WHERE NOT toks = ['']
        UNION ALL
        SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS f
        FROM d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      fb AS (SELECT doc_id,
          ('0x'||substr(md5(f),1,15))::BIGINT % 1024 AS bucket FROM feats),
      scored AS (
        SELECT fb.doc_id, CAST(sum(coalesce(w.w, 0)) AS BIGINT) AS logit
        FROM fb LEFT JOIN w USING (bucket) GROUP BY fb.doc_id),
      lab AS (SELECT s.doc_id AS id,
               least(greatest(5000 + s.logit * 100, 0), 10000) AS p,
               (dd.lang = 'en') AS y
             FROM scored s JOIN documents dd USING (doc_id)),
      binned AS (SELECT id, p, y,
          CAST(ntile(10) OVER (ORDER BY p, id) AS INTEGER) AS bin
        FROM lab),
      bins AS (SELECT bin, count(*) AS n,
               sum(CASE WHEN y THEN 1 ELSE 0 END) AS np,
               sum(p) AS psum, min(p) AS pred_min, max(p) AS pred_max
             FROM binned GROUP BY 1),
      b2 AS (SELECT bin, CAST(n AS BIGINT) AS n,
               CAST(np AS BIGINT) AS n_pos,
               CAST(np * 10000 // n AS BIGINT) AS obs_bp,
               CAST(psum // n AS BIGINT) AS pred_bp,
               CAST(pred_min AS BIGINT) AS pred_min,
               CAST(pred_max AS BIGINT) AS pred_max
             FROM bins),
      b3 AS (SELECT *, abs(obs_bp - pred_bp) AS gap_bp FROM b2),
      ece AS (SELECT CAST(sum(n * gap_bp) // sum(n) AS BIGINT) AS ece_bp
              FROM b3)
      SELECT b3.bin, b3.n, b3.n_pos, b3.obs_bp, b3.pred_bp, b3.pred_min,
             b3.pred_max, b3.gap_bp, e.ece_bp
      FROM b3 CROSS JOIN ece e"""))

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): rank each
    * source's documents by self-trained LM surprisal and cut into
    * head/middle/tail terciles — the standard "keep head+middle, drop
    * tail" web-curation admission. Composes [[Corpus.unigramSurprisal]]
    * with a fully-deterministic tercile (ties broken by doc_id), so the
    * bucket boundaries, per-bucket counts, and surprisal ranges all
    * hash-match the SQL replay — which still uses a literal `ntile`.
    *
    * The Spark side deliberately does NOT use `ntile.over(partitionBy
    * (source))`: that plan is a full single-partition sort per stratum
    * (`ntile` gets no `WindowGroupLimit` prune), i.e. one task chewing a
    * whole source at 100 TB. [[graft.ext.Prefix.stratifiedNtile]]
    * reproduces ntile's exact remainder distribution from a distributed
    * rank + a broadcast per-source (first_rank, count) table.
    */
  val qPerplexityBuckets = Q("q_perplexity_buckets",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = Corpus.unigramSurprisal(docs, "doc_id", "text")
        .select(col("id").as("doc_id"), col("mean_surprisal_x10k"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      graft.ext.Prefix.stratifiedNtile(scored, Seq(col("source")),
          Seq(col("mean_surprisal_x10k"), col("doc_id")), 3, "bucket")
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("mean_surprisal_x10k")).as("min_mean_x10k"),
          max(col("mean_surprisal_x10k")).as("max_mean_x10k"))
        .withColumn("keep", col("bucket") <= 2)
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
      tot AS (SELECT count(*) AS n_total FROM tok),
      scored AS (
        SELECT t.doc_id,
          CAST(floor(-ln(f.cnt::DOUBLE / o.n_total) * 10000 + 0.5) AS BIGINT)
            AS nat10k
        FROM tok t JOIN freq f USING (token) CROSS JOIN tot o),
      perdoc AS (
        SELECT doc_id, CAST(sum(nat10k) AS BIGINT) // count(*) AS m
        FROM scored GROUP BY doc_id),
      ranked AS (
        SELECT d.source, p.m,
          ntile(3) OVER (PARTITION BY d.source
            ORDER BY p.m, p.doc_id) AS bucket
        FROM perdoc p JOIN documents d USING (doc_id))
      SELECT source, bucket, count(*) AS n_docs,
        min(m) AS min_mean_x10k, max(m) AS max_mean_x10k,
        bucket <= 2 AS keep
      FROM ranked GROUP BY source, bucket"""))

  /** C4 cleaning battery ([[Corpus.c4Rules]], Raffel 2020 §2.2) over a
    * deterministic PUNCTUATED projection of the corpus (the fixture
    * text has no newlines or sentence punctuation, so the line rules
    * would be vacuous on it raw — same pattern as the UTF-8 coverage
    * row): token i gets '.' + newline every 24th position, '.' every
    * 8th, building 3-sentence lines; planted rule-trippers keep every
    * rule binding — doc_id%43==11 truncates to 20 tokens (< 3
    * sentences), %31==5 appends '{' (code page), %37==7 appends a
    * 5-word line containing "javascript" (line-level drop, page
    * survives), %41==9 appends a line with a blocklist word (page
    * drop). The tail fragment after the last newline usually lacks
    * terminal punctuation, so the line filter binds on nearly every
    * document; `clean_fp` hash-pins every byte of the reassembly.
    */
  val qC4Rules = Q("q_c4_rules",
    (s, dir) => {
      val toks0 = TextOps.tokens(col("text"))
      val built = t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 43 === 11, slice(toks0, 1, 20))
            .otherwise(toks0).as("tk"))
        .select(col("doc_id"), concat(
          // sequence(1, 0) is the DESCENDING [1, 0] in Spark (DuckDB's
          // generate_series(1, 0) is empty) and element_at(tk, 0) throws
          // — guard the zero-token document explicitly
          when(size(col("tk")) === 0, lit("")).otherwise(
            rtrim(array_join(transform(sequence(lit(1), size(col("tk"))), i =>
              concat(element_at(col("tk"), i),
                when(i % 24 === 0, lit(".\n"))
                  .when(i % 8 === 0, lit(". "))
                  .otherwise(lit(" ")))), ""))),
          when(col("doc_id") % 31 === 5, lit(" {")).otherwise(lit("")),
          when(col("doc_id") % 37 === 7,
            lit("\njavascript is inline here ok.")).otherwise(lit("")),
          when(col("doc_id") % 41 === 9,
            lit("\nthis page has verybadword inside it."))
            .otherwise(lit(""))).as("built"))
      Corpus.c4Rules(built, "doc_id", "built",
        badWords = Seq("verybadword"))
    },
    Some("""WITH tk0 AS (
        SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
      tk1 AS (
        SELECT doc_id,
          CASE WHEN doc_id % 43 = 11 THEN tk[1:20] ELSE tk END AS tk
        FROM tk0),
      built AS (
        SELECT doc_id,
          rtrim(array_to_string(list_transform(generate_series(1, len(tk)),
            i -> tk[i] || CASE WHEN i % 24 = 0 THEN '.' || chr(10)
                               WHEN i % 8 = 0 THEN '. '
                               ELSE ' ' END), ''))
          || CASE WHEN doc_id % 31 = 5 THEN ' {' ELSE '' END
          || CASE WHEN doc_id % 37 = 7
               THEN chr(10) || 'javascript is inline here ok.' ELSE '' END
          || CASE WHEN doc_id % 41 = 9
               THEN chr(10) || 'this page has verybadword inside it.'
               ELSE '' END AS b
        FROM tk1),
      split_ AS (
        SELECT doc_id, b, string_split(b, chr(10)) AS ls FROM built),
      kept AS (
        SELECT doc_id, b, len(ls) AS n_lines,
          list_filter(ls, l ->
            regexp_matches(rtrim(l), '[.!?"]$')
            AND len(regexp_extract_all(l, '\S+')) >= 5
            AND NOT contains(lower(l), 'javascript')) AS kl
        FROM split_),
      agg AS (
        SELECT doc_id, b, n_lines, len(kl) AS n_kept_lines,
          -- DuckDB: array_to_string of an EMPTY list is NULL; Spark's
          -- array_join is '' — the all-lines-dropped doc must md5('')
          coalesce(array_to_string(kl, chr(10)), '') AS clean
        FROM kept)
      SELECT doc_id AS id, CAST(n_lines AS BIGINT) AS n_lines,
        CAST(n_kept_lines AS BIGINT) AS n_kept_lines,
        CAST(len(regexp_extract_all(clean, '[.!?]')) AS BIGINT)
          AS n_sentences,
        (len(regexp_extract_all(clean, '[.!?]')) >= 3
         AND NOT contains(b, '{')
         AND NOT contains(lower(b), 'lorem ipsum')
         AND NOT regexp_matches(lower(b), '\b(verybadword)\b')) AS keep,
        CAST(length(clean) AS BIGINT) AS clean_len, md5(clean) AS clean_fp
      FROM agg"""))

  /** Gopher rule battery (Rae et al. 2021): the canonical heuristic
    * quality gate — word-count and mean-word-length windows,
    * symbol-to-word and alphabetic-word ratios, ≥2 distinct stopwords —
    * every rule an integer/boolean over normalized text, the whole
    * battery and verdict hash-matched.
    */
  val qGopherRules = Q("q_gopher_rules",
    (s, dir) => Corpus.gopherRules(t(s, dir, "documents"), "doc_id", "text",
        stopwords = graft.ext.TextOps.Stopwords)
      .select(col("id").as("doc_id"), col("n_words"), col("mean_len_x100"),
        col("symbol_bp"), col("alpha_bp"), col("n_stop_distinct"),
        col("r_wordcount"), col("r_meanlen"), col("r_symbol"),
        col("r_alpha"), col("r_stopwords"), col("keep")),
    Some("""WITH d AS (
        SELECT doc_id, trim(regexp_replace(lower(text),'\s+',' ','g')) AS t
        FROM documents),
      b AS (
        SELECT doc_id, t, string_split(t, ' ') AS toks,
          CASE WHEN t = '' THEN 0
               ELSE len(string_split(t, ' ')) END AS n
        FROM d),
      m AS (
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
        FROM b)
      SELECT doc_id, n_words,
        CAST(mean_len_x100 AS BIGINT) AS mean_len_x100,
        CAST(symbol_bp AS BIGINT) AS symbol_bp,
        CAST(alpha_bp AS BIGINT) AS alpha_bp, n_stop_distinct,
        n_words BETWEEN 50 AND 100000 AS r_wordcount,
        mean_len_x100 BETWEEN 300 AND 1000 AS r_meanlen,
        symbol_bp <= 1000 AS r_symbol,
        alpha_bp >= 8000 AS r_alpha,
        n_stop_distinct >= 2 AS r_stopwords,
        (n_words BETWEEN 50 AND 100000) AND (mean_len_x100 BETWEEN 300 AND 1000)
          AND symbol_bp <= 1000 AND alpha_bp >= 8000
          AND n_stop_distinct >= 2 AS keep
      FROM m"""))

  /** Gopher repetition battery (Rae et al. 2021, table A1's other
    * half): duplicate line/paragraph fractions by occurrence and by
    * character mass, top-{2,3,4}-gram character coverage, duplicated-
    * {5..10}-gram character mass — all exact integer basis points (the
    * occurrence-mass forms documented at [[Corpus.repetitionSignals]]),
    * whole battery + verdict hash-matched. The oracle groups units by
    * their strings where Spark groups by xxhash64 — identical counts
    * barring a 64-bit collision inside one document.
    */
  val qGopherRepetition = Q("q_gopher_repetition",
    (s, dir) => Corpus.repetitionSignals(t(s, dir, "documents"),
        "doc_id", "text")
      .withColumnRenamed("id", "doc_id"),
    Some("WITH " + repetitionCtes("") + """
      SELECT * FROM bp"""))

  /** Repetition-battery oracle CTE chain, name-prefixed so composites
    * can embed it (the [[dsirCtesNamed]] convention). Exposes
    * `${px}bp(doc_id, n_lines, n_paras, total_chars, *_bp, keep)` —
    * [[Corpus.repetitionSignals]]'s exact output. Units are grouped by
    * their strings where Spark groups by xxhash64 — identical counts
    * barring a 64-bit collision inside one document.
    */
  private[graft] def repetitionCtes(px: String, top2Max: Int = 2000,
                             top3Max: Int = 1800,
                             top4Max: Int = 1600): String = s"""${px}base AS (
        SELECT doc_id, text AS raw,
          trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
        FROM documents),
      ${px}b AS MATERIALIZED (
        SELECT doc_id, raw, t, length(t) AS tc, string_split(t, ' ') AS ts
        FROM ${px}base WHERE t <> ''),
      ${px}lu0 AS (
        SELECT doc_id, unnest(string_split(raw, chr(10))) AS u0 FROM ${px}b),
      ${px}lu AS (
        SELECT doc_id, 0 AS k,
          trim(regexp_replace(lower(u0), '\\s+', ' ', 'g')) AS unit
        FROM ${px}lu0),
      ${px}pu0 AS (
        SELECT doc_id, unnest(string_split(raw, chr(10)||chr(10))) AS u0
        FROM ${px}b),
      ${px}pu AS (
        SELECT doc_id, 1 AS k,
          trim(regexp_replace(lower(u0), '\\s+', ' ', 'g')) AS unit
        FROM ${px}pu0),
      ${px}bn AS (
        SELECT doc_id, ts, unnest(generate_series(2, 10)) AS n FROM ${px}b),
      ${px}ng AS (
        SELECT doc_id, n AS k,
          array_to_string(ts[g.i:g.i + n - 1], ' ') AS unit
        FROM ${px}bn,
          LATERAL (SELECT unnest(generate_series(1, len(ts) - n + 1)) AS i) g),
      ${px}units AS (
        SELECT doc_id, k, unit FROM ${px}lu WHERE unit <> ''
        UNION ALL SELECT doc_id, k, unit FROM ${px}pu WHERE unit <> ''
        UNION ALL SELECT doc_id, k, unit FROM ${px}ng),
      ${px}counted AS (
        SELECT doc_id, k, unit, count(*) AS cnt, length(unit) AS chars
        FROM ${px}units GROUP BY 1, 2, 3, length(unit)),
      ${px}perdoc AS (
        SELECT doc_id,
          CAST(sum(CASE WHEN k = 0 THEN cnt ELSE 0 END) AS BIGINT) AS nl,
          CAST(sum(CASE WHEN k = 1 THEN cnt ELSE 0 END) AS BIGINT) AS np,
          CAST(sum(CASE WHEN k = 0 AND cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dl,
          CAST(sum(CASE WHEN k = 1 AND cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dp,
          CAST(sum(CASE WHEN k = 0 THEN cnt * chars ELSE 0 END) AS BIGINT) AS ml,
          CAST(sum(CASE WHEN k = 1 THEN cnt * chars ELSE 0 END) AS BIGINT) AS mp,
          CAST(sum(CASE WHEN k = 0 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS dml,
          CAST(sum(CASE WHEN k = 1 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS dmp,
          CAST(max(CASE WHEN k = 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS t2,
          CAST(max(CASE WHEN k = 3 THEN cnt * chars ELSE 0 END) AS BIGINT) AS t3,
          CAST(max(CASE WHEN k = 4 THEN cnt * chars ELSE 0 END) AS BIGINT) AS t4,
          CAST(sum(CASE WHEN k = 5 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d5,
          CAST(sum(CASE WHEN k = 6 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d6,
          CAST(sum(CASE WHEN k = 7 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d7,
          CAST(sum(CASE WHEN k = 8 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d8,
          CAST(sum(CASE WHEN k = 9 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d9,
          CAST(sum(CASE WHEN k = 10 AND cnt >= 2 THEN cnt * chars ELSE 0 END) AS BIGINT) AS d10
        FROM ${px}counted GROUP BY 1),
      ${px}bp0 AS (
        SELECT p.doc_id, p.nl AS n_lines, p.np AS n_paras,
          CAST(b.tc AS BIGINT) AS total_chars,
          CASE WHEN p.nl > 0 THEN least(10000, (p.dl * 10000) // p.nl) ELSE 0 END AS dup_line_bp,
          CASE WHEN p.ml > 0 THEN least(10000, (p.dml * 10000) // p.ml) ELSE 0 END AS dup_line_char_bp,
          CASE WHEN p.np > 0 THEN least(10000, (p.dp * 10000) // p.np) ELSE 0 END AS dup_para_bp,
          CASE WHEN p.mp > 0 THEN least(10000, (p.dmp * 10000) // p.mp) ELSE 0 END AS dup_para_char_bp,
          least(10000, (p.t2 * 10000) // b.tc) AS top2_bp,
          least(10000, (p.t3 * 10000) // b.tc) AS top3_bp,
          least(10000, (p.t4 * 10000) // b.tc) AS top4_bp,
          least(10000, (p.d5 * 10000) // b.tc) AS dup5_bp,
          least(10000, (p.d6 * 10000) // b.tc) AS dup6_bp,
          least(10000, (p.d7 * 10000) // b.tc) AS dup7_bp,
          least(10000, (p.d8 * 10000) // b.tc) AS dup8_bp,
          least(10000, (p.d9 * 10000) // b.tc) AS dup9_bp,
          least(10000, (p.d10 * 10000) // b.tc) AS dup10_bp
        FROM ${px}perdoc p JOIN ${px}b b USING (doc_id)),
      ${px}bp AS (
        SELECT *,
          dup_line_bp <= 3000 AND dup_para_bp <= 3000
            AND dup_line_char_bp <= 2000 AND dup_para_char_bp <= 2000
            AND top2_bp <= $top2Max AND top3_bp <= $top3Max
            AND top4_bp <= $top4Max
            AND dup5_bp <= 1500 AND dup6_bp <= 1400 AND dup7_bp <= 1300
            AND dup8_bp <= 1200 AND dup9_bp <= 1100 AND dup10_bp <= 1000
            AS keep
        FROM ${px}bp0)"""

  /** Shared CTE block of the DSIR oracles: features → per-side counts →
    * smoothed fixed-point λ table → exact-integer doc scores, exposing
    * `scored(doc_id, n_features, dsir_x10k)`.
    */
  /** DSIR oracle CTE chain, name-prefixed (so composites can embed it
    * without colliding with their other CTE blocks) and parameterized
    * on the raw-side source (so a ladder can train λ on its own
    * survivor pool instead of the whole corpus). `px = ""` with the
    * default raw filter reproduces the standalone q_dsir_* oracles.
    */
  private[graft] def dsirCtesNamed(px: String, rawSrc: String): String = s"""${px}d AS (
        SELECT doc_id, string_split(
          trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ') AS toks
        FROM documents),
      ${px}feats AS (
        SELECT doc_id, unnest(toks) AS f FROM ${px}d WHERE NOT toks = ['']
        UNION ALL
        SELECT doc_id, toks[g.i] || ' ' || toks[g.i + 1] AS f
        FROM ${px}d, LATERAL (
          SELECT unnest(generate_series(1, len(toks) - 1)) AS i) g
        WHERE NOT toks = ['']),
      ${px}fb AS (SELECT doc_id,
          ('0x'||substr(md5(f),1,15))::BIGINT % 1024 AS bucket FROM ${px}feats),
      ${px}rawf AS ($rawSrc),
      ${px}tgtf AS (SELECT * FROM ${px}fb WHERE doc_id % 97 = 0),
      ${px}cr AS (SELECT bucket, count(*) AS cr FROM ${px}rawf GROUP BY 1),
      ${px}ct AS (SELECT bucket, count(*) AS ct FROM ${px}tgtf GROUP BY 1),
      ${px}nr AS (SELECT count(*) AS nr FROM ${px}rawf),
      ${px}nt AS (SELECT count(*) AS nt FROM ${px}tgtf),
      ${px}lam AS (
        SELECT i AS bucket,
          CAST(floor(ln(((coalesce(ct.ct, 0) + 1.0) * (nr.nr + 1024)) /
                        ((coalesce(cr.cr, 0) + 1.0) * (nt.nt + 1024)))
               * 10000 + 0.5) AS BIGINT) AS lam
        FROM range(0, 1024) t(i)
        LEFT JOIN ${px}cr cr ON cr.bucket = i
        LEFT JOIN ${px}ct ct ON ct.bucket = i
        CROSS JOIN ${px}nr nr CROSS JOIN ${px}nt nt),
      ${px}scored AS (
        SELECT doc_id, count(*) AS n_features,
          CAST(sum(lam.lam) AS BIGINT) AS dsir_x10k
        FROM ${px}rawf rawf JOIN ${px}lam lam USING (bucket)
        GROUP BY doc_id)"""

  private[graft] val dsirCtes: String =
    "WITH " + dsirCtesNamed("", "SELECT * FROM fb WHERE doc_id % 97 <> 0")

  /** DSIR data selection (Xie et al. 2023): importance-score every raw
    * document by the smoothed hashed-n-gram log-likelihood ratio of a
    * held-out target slice vs the raw corpus, then take the top-50 —
    * the "make the corpus look like the target" counterpart of the
    * quality classifier's absolute gate. Per-bucket log-ratios
    * fixed-pointed once; doc scores are exact integer sums, so
    * estimation → λ table → scoring → selection all hash-match.
    */
  val qDsirSelect = Q("q_dsir_select",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.dsirScore(docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", nBuckets = 1024)
        .select(col("id").as("doc_id"), col("n_features"), col("dsir_x10k"))
        .orderBy(col("dsir_x10k").desc, col("doc_id")).limit(50)
    },
    Some(dsirCtes + """
      SELECT doc_id, n_features, dsir_x10k
      FROM scored ORDER BY dsir_x10k DESC, doc_id LIMIT 50"""))

  /** DSIR proper — Gumbel-top-k importance RESAMPLING (the paper's
    * selection mode, vs q_dsir_select's deterministic top-scores):
    * P(selected) ∝ w(x) without replacement via the Gumbel-max trick,
    * noise from the portable hash at the score's own fixed-point scale,
    * so the stochastic sample itself is exact and hash-matched.
    */
  val qDsirResample = Q("q_dsir_resample",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.dsirResample(docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", k = 50, nBuckets = 1024)
        .select(col("id").as("doc_id"), col("n_features"),
          col("dsir_x10k"), col("key_x10k"))
    },
    Some(dsirCtes + """
      SELECT doc_id, n_features, dsir_x10k,
        dsir_x10k + CAST(floor(-ln(-ln(
          (('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT + 1.0)
            / 1152921504606846976.0)) * 10000 + 0.5) AS BIGINT) AS key_x10k
      FROM scored ORDER BY key_x10k DESC, doc_id LIMIT 50"""))

  /** Per-source corpus card ([[Corpus.corpusCard]]): the datasheet
    * summary — volume, exact-dup rate, dominant language + share,
    * token volume, exact length percentiles — with every rounded
    * figure in the portable floor-form and the percentile values
    * replaying Spark's interpolation formula (the q_percentiles
    * oracle pattern).
    */
  val qCorpusCard = Q("q_corpus_card",
    (s, dir) => Corpus.corpusCard(t(s, dir, "documents"),
      "doc_id", "text"),
    Some("""WITH b AS (
        SELECT source, lang, doc_id, n_chars,
          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
          len(regexp_extract_all(text, '\S+')) AS toks
        FROM documents),
      agg AS (
        SELECT source, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS total_chars,
          count(DISTINCT fp) AS distinct_docs,
          CAST(sum(toks) AS BIGINT) AS total_tokens
        FROM b GROUP BY 1),
      lc AS (SELECT source, lang, count(*) AS c FROM b GROUP BY 1, 2),
      tl AS (
        SELECT source, lang AS top_lang, c,
          row_number() OVER (PARTITION BY source
            ORDER BY c DESC, lang DESC) AS rn
        FROM lc),
      s AS (
        SELECT source, list(n_chars ORDER BY n_chars, doc_id) AS xs,
          count(*) AS n
        FROM b GROUP BY 1),
      m AS (
        SELECT source, p.p, xs, n, p.p::DOUBLE * (n - 1) AS h,
          CAST(floor(p.p::DOUBLE * (n - 1)) AS BIGINT) AS lo,
          ceil(p.p::DOUBLE * (n - 1)) AS hi
        FROM s CROSS JOIN (SELECT unnest([0.5, 0.9]) AS p) p),
      v AS (
        SELECT source, p,
          CASE WHEN hi = lo THEN xs[lo + 1]::DOUBLE
               ELSE (hi - h) * xs[lo + 1] + (h - lo) * xs[lo + 2]
          END AS q
        FROM m),
      pct AS (
        SELECT source,
          max(CASE WHEN p = 0.5 THEN q END) AS p50x,
          max(CASE WHEN p = 0.9 THEN q END) AS p90x
        FROM v GROUP BY 1)
      SELECT a.source, a.n_docs, a.total_chars,
        floor((a.n_docs - a.distinct_docs)::DOUBLE / a.n_docs * 10000
          + 0.5) / 10000 AS dup_rate,
        t.top_lang,
        floor(t.c::DOUBLE / a.n_docs * 10000 + 0.5) / 10000
          AS top_lang_share,
        a.total_tokens,
        floor(a.total_tokens::DOUBLE / a.n_docs * 100 + 0.5) / 100
          AS mean_toks,
        floor(pct.p50x * 100 + 0.5) / 100 AS p50_chars,
        floor(pct.p90x * 100 + 0.5) / 100 AS p90_chars
      FROM agg a
      JOIN tl t ON t.source = a.source AND t.rn = 1
      JOIN pct ON pct.source = a.source"""))

  /** Cross-source duplication matrix ([[Corpus.crossSourceDup]]): the
    * datasheet statistic the card's within-source dup_rate can't see,
    * here over the n-gram-Jaccard pair relation (τ=0.25, the
    * dedup_ngram_jaccard dial — this fixture's duplicate copies land
    * in DIFFERENT sources as near-dups, and carry ZERO exact-fp
    * overlap at any SF, so the near-dup relation is the one with
    * signal; the operator itself takes any (id_a, id_b) pair frame,
    * exact-fingerprint pairs included). Ordered directions: the
    * (A, B) row reads "n_docs_dup of A's docs have a near-dup in B,
    * dup_share of A's volume"; the diagonal is the within-source
    * near-dup rate.
    */
  val qCorpusCardXsource = Q("q_corpus_card_xsource",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.crossSourceDup(
        Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.25),
        docs.select(col("doc_id").as("id"), col("source")))
    },
    Some("""WITH docs AS (
        SELECT doc_id, source,
               string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id, source, list_distinct(list_transform(
          generate_series(1, greatest(len(w)-2, 0)),
          i -> array_to_string(w[i:i+2], ' '))) AS sset
        FROM docs),
      ex AS (SELECT doc_id, source, len(sset) AS m, unnest(sset) AS shingle FROM sh),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.source AS src_a, b.source AS src_b
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id, a.source, b.source, a.m, b.m
        HAVING round(count(*)::DOUBLE / (a.m + b.m - count(*)), 4) >= 0.25),
      directed AS (
        SELECT src_a AS source, src_b AS other_source, id_a AS doc FROM pairs
        UNION ALL
        SELECT src_b, src_a, id_b FROM pairs),
      tot AS (SELECT source, count(*) AS n_total FROM docs GROUP BY 1),
      agg AS (
        SELECT source, other_source, count(DISTINCT doc) AS n_docs_dup
        FROM directed GROUP BY 1, 2)
      SELECT a.source, a.other_source, a.n_docs_dup,
        floor(a.n_docs_dup::DOUBLE / t.n_total * 10000 + 0.5) / 10000
          AS dup_share
      FROM agg a JOIN tot t ON t.source = a.source"""))

  /** Directed containment quote matrix ([[Corpus.crossSourceQuotes]]):
    * "how much of source A is quoted inside source B" — the direction
    * the unordered matrix (q_corpus_card_xsource) folds away, fed by
    * [[Dedup.containmentPairs]]'s ordered (contained → host) relation
    * at τ=0.5; diagonal = within-source quoting.
    */
  val qCorpusCardXsourceCont = Q("q_corpus_card_xsource_cont",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.crossSourceQuotes(
        Dedup.containmentPairs(docs, "doc_id", "text", n = 3, tau = 0.5),
        docs.select(col("doc_id").as("id"), col("source")))
    },
    Some("""WITH docs AS (
        SELECT doc_id, source,
               string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id, source, list_distinct(list_transform(
          generate_series(1, greatest(len(w)-2, 0)),
          i -> array_to_string(w[i:i+2], ' '))) AS sset
        FROM docs),
      ex AS (SELECT doc_id, source, len(sset) AS m, unnest(sset) AS shingle FROM sh),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               a.source AS s_a, b.source AS s_b,
               a.m AS m_a, b.m AS m_b, count(*) AS c
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4, 5, 6),
      dirs AS (
        SELECT id_a AS src_id, s_a AS quoted_source, s_b AS host_source,
               round(c::DOUBLE / m_a, 4) AS cont FROM inter
        UNION ALL
        SELECT id_b, s_b, s_a, round(c::DOUBLE / m_b, 4) FROM inter),
      q AS (SELECT * FROM dirs WHERE cont >= 0.5),
      tot AS (SELECT source, count(*) AS n_total FROM docs GROUP BY 1),
      agg AS (
        SELECT quoted_source, host_source,
               count(DISTINCT src_id) AS n_docs_quoted
        FROM q GROUP BY 1, 2)
      SELECT a.quoted_source, a.host_source, a.n_docs_quoted,
        floor(a.n_docs_quoted::DOUBLE / t.n_total * 10000 + 0.5) / 10000
          AS quoted_share
      FROM agg a JOIN tot t ON t.source = a.quoted_source"""))

  /** Per-document Unicode-script mix ([[TextOps.scriptMix]]): counts +
    * basis points per script class and the dominant script. The fixture
    * text is pure ASCII, so lang-keyed mixed-script suffixes are
    * planted in the projection (the `dedup_substr_coverage_utf8`
    * pattern) — every class column binds for some slice instead of
    * hashing a table of zeros.
    */
  val qScriptMix = Q("q_script_mix",
    (s, dir) => {
      val proj = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("lang") === "zh", lit(" 这是中文注释 2024"))
            .when(col("lang") === "de", lit(" αβγδ ελληνικά"))
            .when(col("lang") === "es", lit(" кириллица тест"))
            .when(col("lang") === "fr", lit(" نص عربي €§"))
            .otherwise(lit(""))).as("t"))
      val names = TextOps.scriptClasses.map(_._1) :+ "other"
      TextOps.scriptMix(proj, "doc_id", "t")
        .select((col("id").as("doc_id") +: col("n_chars") +:
          names.map(n => col(s"n_$n"))) ++
          names.map(n => col(s"${n}_bp")) :+ col("dominant"): _*)
    },
    Some("""WITH p AS (
        SELECT doc_id, text || CASE lang
            WHEN 'zh' THEN ' 这是中文注释 2024'
            WHEN 'de' THEN ' αβγδ ελληνικά'
            WHEN 'es' THEN ' кириллица тест'
            WHEN 'fr' THEN ' نص عربي €§'
            ELSE '' END AS t
        FROM documents),
      c AS (
        SELECT doc_id, length(t) AS n_chars,
          length(t) - length(regexp_replace(t, '[A-Za-z]', '', 'g')) AS n_latin,
          length(t) - length(regexp_replace(t, '[\x{0400}-\x{04ff}]', '', 'g')) AS n_cyrillic,
          length(t) - length(regexp_replace(t, '[\x{0370}-\x{03ff}]', '', 'g')) AS n_greek,
          length(t) - length(regexp_replace(t, '[\x{4e00}-\x{9fff}]', '', 'g')) AS n_cjk,
          length(t) - length(regexp_replace(t, '[\x{0600}-\x{06ff}]', '', 'g')) AS n_arabic,
          length(t) - length(regexp_replace(t, '[0-9]', '', 'g')) AS n_digit,
          length(t) - length(regexp_replace(t, '[ \t\n\r\f]', '', 'g')) AS n_space
        FROM p),
      c2 AS (
        SELECT *, n_chars - n_latin - n_cyrillic - n_greek - n_cjk
            - n_arabic - n_digit - n_space AS n_other,
          greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic,
            n_digit, n_space,
            n_chars - n_latin - n_cyrillic - n_greek - n_cjk
              - n_arabic - n_digit - n_space) AS mx
        FROM c)
      SELECT doc_id, n_chars, n_latin, n_cyrillic, n_greek, n_cjk,
        n_arabic, n_digit, n_space, n_other,
        CASE WHEN n_chars > 0 THEN (n_latin * 10000) // n_chars ELSE 0 END AS latin_bp,
        CASE WHEN n_chars > 0 THEN (n_cyrillic * 10000) // n_chars ELSE 0 END AS cyrillic_bp,
        CASE WHEN n_chars > 0 THEN (n_greek * 10000) // n_chars ELSE 0 END AS greek_bp,
        CASE WHEN n_chars > 0 THEN (n_cjk * 10000) // n_chars ELSE 0 END AS cjk_bp,
        CASE WHEN n_chars > 0 THEN (n_arabic * 10000) // n_chars ELSE 0 END AS arabic_bp,
        CASE WHEN n_chars > 0 THEN (n_digit * 10000) // n_chars ELSE 0 END AS digit_bp,
        CASE WHEN n_chars > 0 THEN (n_space * 10000) // n_chars ELSE 0 END AS space_bp,
        CASE WHEN n_chars > 0 THEN (n_other * 10000) // n_chars ELSE 0 END AS other_bp,
        CASE WHEN n_chars = 0 THEN 'none'
             WHEN n_latin = mx THEN 'latin'
             WHEN n_cyrillic = mx THEN 'cyrillic'
             WHEN n_greek = mx THEN 'greek'
             WHEN n_cjk = mx THEN 'cjk'
             WHEN n_arabic = mx THEN 'arabic'
             WHEN n_digit = mx THEN 'digit'
             WHEN n_space = mx THEN 'space'
             ELSE 'other' END AS dominant
      FROM c2"""))

  /** Character-level Shannon entropy per document
    * ([[TextOps.charEntropy]]) in integer micro-nats — the low-entropy
    * gibberish/boilerplate quality signal. Per-character contributions
    * are fixed-pointed before the unordered sum and the 1/N scaling is
    * an exact integer division, so the score replays in any engine
    * computing the same ln values.
    */
  val qCharEntropy = Q("q_char_entropy",
    (s, dir) => TextOps.charEntropy(t(s, dir, "documents"),
        "doc_id", "text")
      .select(col("id").as("doc_id"), col("n"), col("entropy_micro")),
    Some("""WITH ch AS (
        SELECT doc_id, unnest(string_split(text, '')) AS c
        FROM documents),
      cc AS (SELECT doc_id, c, count(*) AS nc FROM ch GROUP BY 1, 2),
      ag AS (SELECT doc_id, CAST(sum(nc) AS BIGINT) AS n,
          CAST(sum(CAST(floor(nc * ln(nc::DOUBLE) * 1e6 + 0.5) AS BIGINT))
            AS BIGINT) AS t
        FROM cc GROUP BY 1)
      SELECT d.doc_id, coalesce(a.n, 0) AS n,
        CASE WHEN a.n > 0
          THEN CAST(floor(ln(a.n::DOUBLE) * 1e6 + 0.5) AS BIGINT)
               - (a.t // a.n)
          ELSE 0 END AS entropy_micro
      FROM documents d LEFT JOIN ag a USING (doc_id)"""))
}
