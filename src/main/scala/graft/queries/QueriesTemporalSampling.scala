package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compact.Compaction
import graft.envelope.{DmsCdc, MongoCdc, PgCdc}
import graft.ext.{Corpus, DataQuality, Dedup, Multimodal, Similarity, TextOps}

/** Temporal operators (as-of, range, SCD2), percentiles, sampling,
  * retrieval (TF-IDF/BM25/RRF hybrid), vocabulary, BPE learn/encode.
  *
  * One mixin slice of [[Queries]] — split mechanically from the former
  * single Queries.scala (no behavior change); mixin order in `object
  * Queries` preserves the original definition/initialization order.
  */
private[graft] trait QueriesTemporalSampling { this: Queries.type =>

  // Extension: temporal relational operators (as-of join, range join,
  // SCD2 history reconstruction) — see graft.operators.Temporal.
  // ---------------------------------------------------------------------

  /** As-of join: each purchase event gets the user's most recent view
    * event at-or-before it. Spark side is the single-shuffle
    * union+carry-forward plan; oracle is DuckDB's native ASOF JOIN over
    * the same tie-compacted right side.
    */
  val qAsofJoin = Q("q_asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val views = Compaction.latestPerKey(
        ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"), col("value")),
        Seq("user_id", "ts"), Seq("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.Temporal.asOf(purchases, views, Seq("user_id"),
          leftTime = "ts", rightTime = "ts",
          carry = Seq("event_id", "value"), prefix = "view_")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("view_event_id"), col("view_value"))
    },
    Some("""WITH views AS (
        SELECT user_id, ts, event_id, value FROM (
          SELECT user_id, ts, event_id, value,
                 row_number() OVER (PARTITION BY user_id, ts
                   ORDER BY event_id DESC) AS rn
          FROM events WHERE event_type = 'view') WHERE rn = 1),
      p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
             v.event_id AS view_event_id, v.value AS view_value
      FROM p ASOF JOIN views v ON p.user_id = v.user_id AND v.ts <= p.ts"""))

  /** Range (interval) join: events within one hour after each signup. */
  val qRangeJoin = Q("q_range_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val sgn = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("s_id"), col("user_id").as("s_user"),
          col("ts").as("s_ts"))
      val e = ev.select(col("event_id").as("e_id"),
        col("user_id").as("e_user"), col("ts").as("e_ts"))
      sgn.join(e, col("e_user") === col("s_user") &&
          col("e_ts") > col("s_ts") &&
          col("e_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"), "left")
        .groupBy(col("s_id"), col("s_user"))
        .agg(count(col("e_id")).as("n_follow"))
        .select(col("s_id").as("event_id"), col("s_user").as("user_id"),
          col("n_follow"))
    },
    Some("""SELECT s.event_id, s.user_id, count(e.event_id) AS n_follow
      FROM (SELECT * FROM events WHERE event_type='signup') s
      LEFT JOIN events e ON e.user_id = s.user_id AND e.ts > s.ts
        AND e.ts <= s.ts + INTERVAL 1 HOUR
      GROUP BY s.event_id, s.user_id"""))

  /** SCD2 reconstruction: the event stream becomes validity intervals. */
  val qScd2 = Q("q_scd2",
    (s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Temporal.scd2(ev, Seq("user_id"),
          timeMs = unix_millis(col("ts")), tiebreak = col("event_id"))
        .select(col("user_id"), col("event_id"),
          col("event_type").as("state"),
          col("valid_from_ms"), col("valid_to_ms"), col("is_current"))
    },
    Some("""SELECT user_id, event_id, event_type AS state,
        epoch_ms(ts) AS valid_from_ms,
        coalesce(lead(epoch_ms(ts)) OVER w, 253402300799999) AS valid_to_ms,
        CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)"""))

  /** First-touch funnel over the event stream
    * ([[graft.operators.Temporal.funnel]]): signup → view → click →
    * purchase within one hour of the FIRST signup, greedy
    * earliest-match per step, one conditional-min round per step — no
    * per-user event arrays, no window sorts. The full per-entity
    * relation (each step's completion ms + steps_completed) is the
    * gate row, not just the summary counts.
    */
  val qFunnel = Q("q_funnel",
    (s, dir) => graft.operators.Temporal.funnel(t(s, dir, "events"),
      "user_id", "event_type", unix_millis(col("ts")),
      Seq("signup", "view", "click", "purchase"),
      windowMs = Some(3600000L)),
    Some("""WITH s1 AS (
        SELECT user_id AS entity, min(epoch_ms(ts)) AS t_1
        FROM events WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (
        SELECT s1.entity, s1.t_1,
          min(CASE WHEN epoch_ms(e.ts) > s1.t_1
                    AND epoch_ms(e.ts) <= s1.t_1 + 3600000
                   THEN epoch_ms(e.ts) END) AS t_2
        FROM s1 LEFT JOIN events e
          ON e.user_id = s1.entity AND e.event_type = 'view'
        GROUP BY 1, 2),
      s3 AS (
        SELECT s2.entity, s2.t_1, s2.t_2,
          min(CASE WHEN epoch_ms(e.ts) > s2.t_2
                    AND epoch_ms(e.ts) <= s2.t_1 + 3600000
                   THEN epoch_ms(e.ts) END) AS t_3
        FROM s2 LEFT JOIN events e
          ON e.user_id = s2.entity AND e.event_type = 'click'
        GROUP BY 1, 2, 3),
      s4 AS (
        SELECT s3.entity, s3.t_1, s3.t_2, s3.t_3,
          min(CASE WHEN epoch_ms(e.ts) > s3.t_3
                    AND epoch_ms(e.ts) <= s3.t_1 + 3600000
                   THEN epoch_ms(e.ts) END) AS t_4
        FROM s3 LEFT JOIN events e
          ON e.user_id = s3.entity AND e.event_type = 'purchase'
        GROUP BY 1, 2, 3, 4)
      SELECT entity, t_1, t_2, t_3, t_4,
        (CASE WHEN t_1 IS NOT NULL THEN 1 ELSE 0 END)
        + (CASE WHEN t_2 IS NOT NULL THEN 1 ELSE 0 END)
        + (CASE WHEN t_3 IS NOT NULL THEN 1 ELSE 0 END)
        + (CASE WHEN t_4 IS NOT NULL THEN 1 ELSE 0 END) AS steps_completed
      FROM s4"""))

  /** Conversion card over the q_funnel relation
    * ([[graft.operators.Temporal.funnelSummary]]): per step, entities
    * reaching it + step-over-step conversion in exact integer ppm.
    */
  val qFunnelSummary = Q("q_funnel_summary",
    (s, dir) => graft.operators.Temporal.funnelSummary(
      graft.operators.Temporal.funnel(t(s, dir, "events"),
        "user_id", "event_type", unix_millis(col("ts")),
        Seq("signup", "view", "click", "purchase"),
        windowMs = Some(3600000L)),
      Seq("signup", "view", "click", "purchase")),
    Some("""WITH s1 AS (
        SELECT user_id AS entity, min(epoch_ms(ts)) AS t_1
        FROM events WHERE event_type = 'signup' GROUP BY 1),
      s2 AS (
        SELECT s1.entity, s1.t_1,
          min(CASE WHEN epoch_ms(e.ts) > s1.t_1
                    AND epoch_ms(e.ts) <= s1.t_1 + 3600000
                   THEN epoch_ms(e.ts) END) AS t_2
        FROM s1 LEFT JOIN events e
          ON e.user_id = s1.entity AND e.event_type = 'view'
        GROUP BY 1, 2),
      s3 AS (
        SELECT s2.entity, s2.t_1, s2.t_2,
          min(CASE WHEN epoch_ms(e.ts) > s2.t_2
                    AND epoch_ms(e.ts) <= s2.t_1 + 3600000
                   THEN epoch_ms(e.ts) END) AS t_3
        FROM s2 LEFT JOIN events e
          ON e.user_id = s2.entity AND e.event_type = 'click'
        GROUP BY 1, 2, 3),
      s4 AS (
        SELECT s3.entity, s3.t_1, s3.t_2, s3.t_3,
          min(CASE WHEN epoch_ms(e.ts) > s3.t_3
                    AND epoch_ms(e.ts) <= s3.t_1 + 3600000
                   THEN epoch_ms(e.ts) END) AS t_4
        FROM s3 LEFT JOIN events e
          ON e.user_id = s3.entity AND e.event_type = 'purchase'
        GROUP BY 1, 2, 3, 4),
      card AS (
        SELECT
          count(CASE WHEN t_1 IS NOT NULL THEN 1 END) AS n1,
          count(CASE WHEN t_2 IS NOT NULL THEN 1 END) AS n2,
          count(CASE WHEN t_3 IS NOT NULL THEN 1 END) AS n3,
          count(CASE WHEN t_4 IS NOT NULL THEN 1 END) AS n4
        FROM s4),
      u AS (
        SELECT 1 AS step, 'signup' AS step_name, n1 AS n_reached,
          n1 AS n_prev FROM card
        UNION ALL SELECT 2, 'view', n2, n1 FROM card
        UNION ALL SELECT 3, 'click', n3, n2 FROM card
        UNION ALL SELECT 4, 'purchase', n4, n3 FROM card)
      SELECT step, step_name, CAST(n_reached AS BIGINT) AS n_reached,
        CASE WHEN n_prev > 0 THEN (n_reached * 1000000) // n_prev
             ELSE 0 END AS conv_from_prev_ppm
      FROM u"""))

  /** Session summary card ([[graft.operators.Temporal.sessionStats]])
    * over the q_sessionize 30-minute sessions: volume + EXACT median
    * events-per-session and session span (the oracle rebuilds the
    * sessions gaps-and-islands style and replays Spark's percentile
    * interpolation over both sorted lists).
    */
  val qSessionStats = Q("q_session_stats",
    (s, dir) => graft.operators.Temporal.sessionStats(
      t(s, dir, "events"), "user_id", col("ts"),
      gap = "30 minutes", gapMs = 1800000L),
    Some("""WITH x AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE OR
                    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 THEN 1 ELSE 0 END AS brk
        FROM events),
      s AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM x),
      sess AS (
        SELECT user_id, count(*) AS n,
          epoch_ms(max(ts)) - epoch_ms(min(ts)) AS span
        FROM s GROUP BY user_id, sid),
      le AS (SELECT list(CAST(n AS DOUBLE) ORDER BY n) AS xs,
               count(*) AS nn FROM sess),
      ls AS (SELECT list(CAST(span AS DOUBLE) ORDER BY span) AS xs,
               count(*) AS nn FROM sess),
      pe AS (
        SELECT CASE WHEN ceil(0.5::DOUBLE * (nn-1)) = floor(0.5::DOUBLE * (nn-1))
          THEN xs[CAST(floor(0.5::DOUBLE * (nn-1)) AS BIGINT) + 1]
          ELSE (ceil(0.5::DOUBLE * (nn-1)) - 0.5::DOUBLE * (nn-1))
                 * xs[CAST(floor(0.5::DOUBLE * (nn-1)) AS BIGINT) + 1]
             + (0.5::DOUBLE * (nn-1) - floor(0.5::DOUBLE * (nn-1)))
                 * xs[CAST(floor(0.5::DOUBLE * (nn-1)) AS BIGINT) + 2]
          END AS q FROM le),
      ps AS (
        SELECT CASE WHEN ceil(0.5::DOUBLE * (nn-1)) = floor(0.5::DOUBLE * (nn-1))
          THEN xs[CAST(floor(0.5::DOUBLE * (nn-1)) AS BIGINT) + 1]
          ELSE (ceil(0.5::DOUBLE * (nn-1)) - 0.5::DOUBLE * (nn-1))
                 * xs[CAST(floor(0.5::DOUBLE * (nn-1)) AS BIGINT) + 1]
             + (0.5::DOUBLE * (nn-1) - floor(0.5::DOUBLE * (nn-1)))
                 * xs[CAST(floor(0.5::DOUBLE * (nn-1)) AS BIGINT) + 2]
          END AS q FROM ls)
      SELECT (SELECT count(*) FROM sess) AS n_sessions,
        (SELECT count(DISTINCT user_id) FROM sess) AS n_entities,
        floor((SELECT q FROM pe) * 100 + 0.5) / 100 AS p50_events,
        floor((SELECT q FROM ps) * 100 + 0.5) / 100 AS p50_span_ms"""))

  /** ANY-TOUCH windowed funnel ([[graft.operators.Temporal
    * .funnelAnyTouch]]): does ANY strictly-ordered signup→view→click→
    * purchase chain fit in one hour — the existence question
    * q_funnel's first-touch anchoring can't answer. The oracle replays
    * the same latest-feasible-anchor DP with DuckDB window functions
    * (running max over a strictly-before RANGE frame), and the
    * earliest qualifying completion is cut identically in both engines
    * (t asc, anchor asc).
    */
  val qFunnelAny = Q("q_funnel_any",
    (s, dir) => graft.operators.Temporal.funnelAnyTouch(
      t(s, dir, "events"), "user_id", "event_type",
      unix_millis(col("ts")),
      Seq("signup", "view", "click", "purchase"),
      windowMs = Some(3600000L)),
    Some("""WITH ev AS (
        SELECT user_id AS e, event_type AS ty, epoch_ms(ts) AS t
        FROM events),
      x1 AS (
        SELECT e, ty, t, CASE WHEN ty = 'signup' THEN t END AS a1
        FROM ev),
      x2 AS (
        SELECT *, CASE WHEN ty = 'view' THEN max(a1) OVER w END AS a2
        FROM x1
        WINDOW w AS (PARTITION BY e ORDER BY t
          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      x3 AS (
        SELECT *, CASE WHEN ty = 'click' THEN max(a2) OVER w END AS a3
        FROM x2
        WINDOW w AS (PARTITION BY e ORDER BY t
          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      x4 AS (
        SELECT *, CASE WHEN ty = 'purchase' THEN max(a3) OVER w END AS a4
        FROM x3
        WINDOW w AS (PARTITION BY e ORDER BY t
          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      q AS (
        SELECT e AS entity, a4 AS anchor_ms, t AS t_complete_ms,
          row_number() OVER (PARTITION BY e ORDER BY t ASC, a4 ASC)
            AS rn
        FROM x4 WHERE a4 IS NOT NULL AND t - a4 <= 3600000)
      SELECT entity, anchor_ms, t_complete_ms FROM q WHERE rn = 1"""))

  /** Weekly cohort retention over the event stream
    * ([[graft.operators.Temporal.retentionMatrix]]): users cohorted by
    * the epoch week of their first activity, one cell per
    * (cohort, offset) with the surviving fraction — the triangular
    * retention chart. Epoch weeks (`ts div 604800000`) on purpose: no
    * calendar/timezone seam between engines.
    */
  val qRetention = Q("q_retention",
    (s, dir) => graft.operators.Temporal.retentionMatrix(
      t(s, dir, "events"), "user_id", unix_millis(col("ts")),
      periodMs = 604800000L),
    Some("""WITH up AS (
        SELECT DISTINCT user_id AS e, epoch_ms(ts) // 604800000 AS p
        FROM events),
      coh AS (SELECT e, min(p) AS cohort FROM up GROUP BY e),
      sizes AS (SELECT cohort, count(*) AS cohort_size FROM coh
        GROUP BY cohort),
      cells AS (
        SELECT c.cohort, up.p - c.cohort AS period_offset,
          count(*) AS n_active
        FROM up JOIN coh c ON up.e = c.e GROUP BY 1, 2)
      SELECT cells.cohort AS cohort_period, period_offset, n_active,
        cohort_size,
        round(n_active::DOUBLE / cohort_size, 4) AS retention
      FROM cells JOIN sizes ON cells.cohort = sizes.cohort"""))

  /** First-order event transition matrix
    * ([[graft.operators.Temporal.transitionMatrix]]): consecutive
    * event-type pairs per user with exact integer-ppm probabilities —
    * the Markov summary of what users do next. Terminal events
    * contribute no pair (rows sum to events − users).
    */
  val qTransitions = Q("q_transitions",
    (s, dir) => graft.operators.Temporal.transitionMatrix(
      t(s, dir, "events"), "user_id", "event_type",
      unix_millis(col("ts")), tiebreak = Seq(col("event_id"))),
    Some("""WITH seq AS (
        SELECT user_id, event_type,
          lead(event_type) OVER (PARTITION BY user_id
            ORDER BY epoch_ms(ts), event_id) AS next_type
        FROM events),
      pairs AS (
        SELECT event_type AS from_type, next_type AS to_type,
          count(*) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT from_type, sum(n) AS nf FROM pairs GROUP BY 1)
      SELECT p.from_type, p.to_type, p.n,
        CAST((p.n * 1000000) // t.nf AS BIGINT) AS p_ppm
      FROM pairs p JOIN tot t USING (from_type)"""))

  /** Exact group percentiles. Two cross-engine IEEE traps, both fixed
    * here by construction:
    *  - interpolation formula: DuckDB's `quantile_cont` computes
    *    `lo + (hi-lo)·d`, Spark's `percentile` computes
    *    `(ceil(h)-h)·lo + (h-floor(h))·hi` — an ulp apart; the oracle
    *    replays SPARK'S formula over the sorted list;
    *  - rounding: Spark's `round` works on the shortest decimal repr,
    *    DuckDB's multiplies by 10^s in doubles — they disagree when
    *    x·100 lands exactly on .5. Both sides therefore round as
    *    `floor(x·100 + 0.5)/100`, which is pure double arithmetic and
    *    bit-identical everywhere.
    */
  private def r2(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5) / 100

  val qPercentiles = Q("q_percentiles",
    (s, dir) => {
      // Distributed exact percentiles (Prefix.groupPercentiles), NOT the
      // `percentile` aggregate: that one buffers each group's whole
      // value→count map and final-merges in |groups| tasks — a 3-task
      // memory funnel over l_returnflag whose state grows with the
      // corpus. Same bits out (the helper replays Spark's interpolation
      // formula, which the oracle below also replays).
      val p = graft.ext.Prefix.groupPercentiles(
        t(s, dir, "lineitem"), Seq("l_returnflag"), col("l_extendedprice"),
        tiebreak = Seq(col("l_orderkey"), col("l_linenumber")),
        ps = Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75", 0.95 -> "q95"))
      p.select(col("l_returnflag"),
        r2(col("q25")).as("p25"), r2(col("q50")).as("p50"),
        r2(col("q75")).as("p75"), r2(col("q95")).as("p95"))
    },
    Some("""WITH s AS (
        SELECT l_returnflag,
          list(l_extendedprice ORDER BY l_extendedprice) AS xs,
          count(*) AS n
        FROM lineitem GROUP BY 1),
      m AS (
        -- p must be DOUBLE: a bare 0.5 literal is DECIMAL in DuckDB and
        -- the whole interpolation would run in exact decimal, not IEEE
        SELECT l_returnflag, p.p, xs, n,
          p.p::DOUBLE * (n - 1) AS h,
          CAST(floor(p.p::DOUBLE * (n - 1)) AS BIGINT) AS lo,
          ceil(p.p::DOUBLE * (n - 1)) AS hi
        FROM s CROSS JOIN (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p) p),
      v AS (
        SELECT l_returnflag, p,
          CASE WHEN hi = lo THEN xs[lo + 1]
               ELSE (hi - h) * xs[lo + 1] + (h - lo) * xs[lo + 2]
          END AS q
        FROM m)
      SELECT l_returnflag,
        floor(max(CASE WHEN p = 0.25 THEN q END) * 100 + 0.5) / 100 AS p25,
        floor(max(CASE WHEN p = 0.5  THEN q END) * 100 + 0.5) / 100 AS p50,
        floor(max(CASE WHEN p = 0.75 THEN q END) * 100 + 0.5) / 100 AS p75,
        floor(max(CASE WHEN p = 0.95 THEN q END) * 100 + 0.5) / 100 AS p95
      FROM v GROUP BY l_returnflag"""))

  /** Deterministic hash sample (portable md5, no seed/partitioning
    * dependence) — the reproducible-subset primitive every training-data
    * pipeline needs. Aggregated so the oracle certifies the exact sample.
    */
  val qSample = Q("q_sample",
    (s, dir) => Corpus.hashSample(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber"), pct = 5)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("sum_price")),
    Some("""SELECT l_returnflag, count(*) AS n,
        round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem
      WHERE ('0x'||substr(md5(l_orderkey||':'||l_linenumber),1,15))::BIGINT % 100 < 5
      GROUP BY l_returnflag"""))

  /** The same sample via the xxhash64 production fast path (no md5 per
    * row). DuckDB has no xxhash64, so the sample MEMBERSHIP has no
    * portable oracle — instead the query is PROPERTY-CHECKED: the
    * realized sample rate must sit inside a 6σ binomial interval around
    * the requested 5% (σ = √(p(1−p)/n); xxhash64 is deterministic, so
    * the boolean can't flap). A hash-quality or thresholding regression
    * flips the hash; determinism and exact-rate behavior stay
    * spec-asserted, and the portable-mode twin above certifies the
    * shared plumbing. */
  val qSampleFast = Q("q_sample_fast",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val total = li.agg(count(lit(1)).as("n_total"))
      val samp = Corpus.hashSample(li,
          Seq("l_orderkey", "l_linenumber"), pct = 5, portable = false)
        .agg(count(lit(1)).as("n_samp"))
      total.crossJoin(broadcast(samp))
        .select(col("n_total"),
          (abs(col("n_samp").cast("double") / col("n_total") - lit(0.05))
            <= lit(6.0) * sqrt(lit(0.05 * 0.95) / col("n_total")))
            .as("rate_in_bounds"))
    },
    Some("SELECT count(*) AS n_total, TRUE AS rate_in_bounds FROM lineitem"))

  // ---------------------------------------------------------------------
  // Extension: corpus-level text operators (TF-IDF, vocabulary, PII
  // scrub) — see graft.ext.Corpus.
  // ---------------------------------------------------------------------

  val qTfidf = Q("q_tfidf",
    (s, dir) => Corpus.tfidfTopK(t(s, dir, "documents"), "doc_id", "text", k = 5)
      .select(col("id").as("doc_id"), col("rank"), col("token"), col("score")),
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
      dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
      n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
      scored AS (
        SELECT tf.doc_id, tf.token,
               round(tf.tf * ln(n.n::DOUBLE / dfq.df), 4) AS score
        FROM tf JOIN dfq USING (token) CROSS JOIN n),
      ranked AS (
        SELECT doc_id, token, score,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, token) AS rank
        FROM scored)
      SELECT doc_id, rank, token, score FROM ranked WHERE rank <= 5"""))

  /** Okapi BM25 top-k retrieval for a bag-of-words query — per-(doc,
    * term) contributions fixed-pointed to integer x10k before the
    * per-doc sum, ranked on the total order (score desc, doc asc).
    */
  val qBm25 = Q("q_bm25",
    (s, dir) => Corpus.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        terms = Seq("hash", "join", "merge", "vector"), k = 20)
      .select(col("id").as("doc_id"), col("score_x10k"), col("n_terms")),
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      -- guard: string_split('') yields [''] where Spark's \S+ extract
      -- yields []; without it an empty doc shifts avgdl corpus-wide
      tokg AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tokg GROUP BY 1),
      stats AS (SELECT (SELECT count(*) FROM tokg)::DOUBLE
                         / (SELECT count(*) FROM documents) AS avgdl,
                       (SELECT count(*) FROM documents) AS n_docs),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
             WHERE token IN ('hash', 'join', 'merge', 'vector')
             GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      scored AS (
        SELECT tf.doc_id,
          CAST(floor(
            ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
            * (tf.tf * (1.2 + 1.0))
            / (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
            * 10000 + 0.5) AS BIGINT) AS contrib_x10k
        FROM tf JOIN dfq d USING (token) JOIN dl l USING (doc_id)
        CROSS JOIN stats s)
      SELECT doc_id, CAST(sum(contrib_x10k) AS BIGINT) AS score_x10k,
             count(*) AS n_terms
      FROM scored GROUP BY 1
      ORDER BY score_x10k DESC, doc_id LIMIT 20"""))

  /** Hybrid retrieval: BM25 lexical top-50 fused with cosine vector
    * top-50 (query = embedding 0) by reciprocal-rank fusion — the
    * standard lexical+dense combiner, integer-exact so the fused list
    * is hash-certified end to end. Docs found by BOTH modalities rise
    * (n_lists = 2); rank-only fusion needs no score calibration.
    */
  val qHybridRetrieval = Q("q_hybrid_retrieval",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val lexical = Corpus.bm25TopK(docs, "doc_id", "text",
          terms = Seq("hash", "join", "merge", "vector"), k = 50)
        .withColumn("rank", row_number().over( // 50 rows post-TakeOrdered
          Window.orderBy(col("score_x10k").desc, col("id").asc)))
        .select(col("id"), col("rank"))
      val vector = Similarity.bruteForceTopK(
          emb.select(col("vec_id").as("id"), col("embedding")),
          emb.filter(col("vec_id") === 0)
            .select(col("vec_id").as("id"), col("embedding")), k = 50)
        .select(col("nn_id").as("id"), col("rank"))
      Corpus.rrfFuse(Seq(lexical, vector), topK = 20)
        .select(col("id").as("doc_id"), col("rrf_score"), col("n_lists"))
    },
    Some("""WITH tok AS (
        SELECT doc_id, unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      tokg AS (SELECT doc_id, token FROM tok WHERE token <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM tokg GROUP BY 1),
      stats AS (SELECT (SELECT count(*) FROM tokg)::DOUBLE
                         / (SELECT count(*) FROM documents) AS avgdl,
                       (SELECT count(*) FROM documents) AS n_docs),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
             WHERE token IN ('hash', 'join', 'merge', 'vector')
             GROUP BY 1, 2),
      dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
      bscored AS (
        SELECT tf.doc_id,
          CAST(floor(
            ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
            * (tf.tf * (1.2 + 1.0))
            / (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
            * 10000 + 0.5) AS BIGINT) AS contrib_x10k
        FROM tf JOIN dfq d USING (token) JOIN dl l USING (doc_id)
        CROSS JOIN stats s),
      bagg AS (
        SELECT doc_id, sum(contrib_x10k) AS score_x10k FROM bscored
        GROUP BY 1 ORDER BY score_x10k DESC, doc_id LIMIT 50),
      lex AS (
        SELECT doc_id AS id,
          row_number() OVER (ORDER BY score_x10k DESC, doc_id) AS rank
        FROM bagg),
      vq AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      vscored AS (
        SELECT vec_id AS id,
          round(CASE WHEN list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) = 0 OR list_dot_product(qe::DOUBLE[], qe::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(embedding::DOUBLE[], qe::DOUBLE[]) END, 3) AS sim
        FROM embeddings CROSS JOIN vq WHERE vec_id <> 0),
      vec AS (
        SELECT id, rank FROM (
          SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS rank
          FROM vscored) WHERE rank <= 50),
      pts AS (
        SELECT id, 1000000000 // (60 + rank) AS pts FROM lex
        UNION ALL
        SELECT id, 1000000000 // (60 + rank) AS pts FROM vec)
      SELECT id AS doc_id, CAST(sum(pts) AS BIGINT) AS rrf_score,
             count(*) AS n_lists
      FROM pts GROUP BY id
      ORDER BY rrf_score DESC, id LIMIT 20"""))

  val qVocab = Q("q_vocab",
    (s, dir) => Corpus.vocabulary(t(s, dir, "documents"), "text", topN = 100),
    Some("""WITH tok AS (
        SELECT unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      counts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
      SELECT row_number() OVER (ORDER BY cnt DESC, token) AS rank, token, cnt
      FROM counts ORDER BY rank LIMIT 100"""))

  /** Unrolled-SQL replay of [[graft.ext.Bpe.learn]]: vocab build + one
    * (pair-count → argmax → merge) CTE block per round. The wrapped-
    * symbol string representation (each symbol in U+001F) makes the
    * merge a literal `replace`, identical in both engines — which is
    * what lets even BPE LEARNING be hash-certified.
    */
  private[graft] def bpeLearnCtes(nMerges: Int): String = {
    // MATERIALIZED: each v_r is read twice (pair counts + next round)
    // and the chain is nMerges deep — inlining would re-evaluate the
    // whole prefix per reference (exponential); materialized it's one
    // pass per round, exactly like the Spark loop's per-round cache
    val base = """WITH v0 AS MATERIALIZED (
        SELECT regexp_replace(w, '(.)', chr(31)||'\1'||chr(31), 'g') AS s, cnt
        FROM (
          SELECT w, count(*) AS cnt FROM (
            SELECT unnest(regexp_extract_all(
              trim(regexp_replace(lower(replace(text, chr(31), '')),'\s+',' ','g')),
              '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS w
            FROM documents)
          GROUP BY w ORDER BY cnt DESC, w ASC LIMIT 65536))"""
    val rounds = (0 until nMerges).map { r =>
      s"""
      p$r AS (
        SELECT sy[ix.i] AS l, sy[ix.i+1] AS r, sum(cnt) AS c
        FROM (SELECT cnt,
                string_split(trim(s, chr(31)), chr(31)||chr(31)) AS sy
              FROM v$r),
             LATERAL (SELECT unnest(generate_series(1, len(sy)-1)) AS i) ix
        GROUP BY 1, 2),
      b$r AS MATERIALIZED (
        SELECT l, r FROM p$r ORDER BY c DESC, l ASC, r ASC LIMIT 1),
      v${r + 1} AS MATERIALIZED (
        SELECT replace(s,
          (SELECT chr(31)||l||chr(31)||chr(31)||r||chr(31) FROM b$r),
          (SELECT chr(31)||l||r||chr(31) FROM b$r)) AS s, cnt
        FROM v$r)"""
    }.mkString(",", ",", "")
    base + rounds
  }

  /** BPE merge-table learning (8 rounds over the documents corpus) —
    * the table itself is the query output, hash-matched rank by rank.
    */
  val qBpeLearn = Q("q_bpe_learn",
    (s, dir) => {
      val merges = graft.ext.Bpe.learn(t(s, dir, "documents"), "text",
        nMerges = 8)
      import s.implicits._
      merges.zipWithIndex.map { case ((a, b), i) => (i + 1, a, b) }
        .toDF("rank", "lhs", "rhs")
    },
    Some(bpeLearnCtes(8) + "\n" +
      (0 until 8).map(r =>
        s"SELECT ${r + 1} AS rank, l AS lhs, r AS rhs FROM b$r")
        .mkString("\nUNION ALL\n")))

  /** The encode half of the BPE oracle, shared by `q_bpe_encode` and
    * the `q_corpus_prep_v2` composite: merge-pattern scalars from the
    * learned `b0..b7` + per-word replace chain + per-doc token list.
    * Appended after [[bpeLearnCtes]]; exposes `agg(doc_id, all_toks)`.
    */
  private[graft] val bpeEncodeCtes: String = s"""
      m AS (SELECT ${(0 until 8).map(r =>
        s"(SELECT chr(31)||l||chr(31)||chr(31)||r||chr(31) FROM b$r) AS pat$r, " +
        s"(SELECT chr(31)||l||r||chr(31) FROM b$r) AS rep$r").mkString(", ")}),
      dw AS (
        SELECT doc_id, ix.i, ws[ix.i] AS w
        FROM (
          SELECT doc_id, regexp_extract_all(
            trim(regexp_replace(lower(replace(text, chr(31), '')),'\\s+',' ','g')),
            '[a-z]+|[0-9]+|[^a-z0-9 ]') AS ws
          FROM documents),
          LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) ix),
      et AS (
        SELECT doc_id, i, string_split(trim(${(0 until 8).foldLeft(
          "regexp_replace(w, '(.)', chr(31)||'\\1'||chr(31), 'g')")(
          (acc, r) => s"replace($acc, m.pat$r, m.rep$r)")},
          chr(31)), chr(31)||chr(31)) AS toks
        FROM dw, m),
      agg AS (
        SELECT doc_id, flatten(list(toks ORDER BY i)) AS all_toks
        FROM et GROUP BY doc_id)"""

  /** Learn-then-encode: every document re-tokenized with the learned
    * table; per-doc subword count + an md5 over the full token stream,
    * so the oracle pins every emitted symbol of every document.
    */
  val qBpeEncode = Q("q_bpe_encode",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.ext.Bpe.learn(docs, "text", nMerges = 8)
      // spread: the per-doc encode (chained replace per merge over every
      // word) is the query's dominant narrow stage and would otherwise
      // run with the scan's partitioning — one task on a one-file table
      graft.ext.Materialize.spread(docs).select(col("doc_id"),
          graft.ext.Bpe.encode(col("text"), merges).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_bpe_tokens"),
          md5(concat_ws(" ", col("toks"))).as("tok_fp"))
    },
    Some(bpeLearnCtes(8) + "," + bpeEncodeCtes + """
      SELECT d.doc_id,
        CAST(coalesce(len(a.all_toks), 0) AS BIGINT) AS n_bpe_tokens,
        md5(coalesce(array_to_string(a.all_toks, ' '), '')) AS tok_fp
      FROM documents d LEFT JOIN agg a USING (doc_id)"""))

  /** Per-language tokenizer FERTILITY under the LEARNED merge table —
    * the multilingual data-mix statistic a tokenizer report ships:
    * subword tokens per word, per language. Scripts the merge table
    * under-serves burn more tokens per word (high fertility), which
    * silently shrinks their effective context and inflates their
    * training cost — the number to watch when balancing a multilingual
    * mix. Distinct from q_token_count's REGEX pre-token count: this is
    * fertility under the actual learned vocabulary (the same
    * learn+encode machinery as q_bpe_encode, whose oracle CTEs are
    * reused verbatim), so a merge-table change moves it.
    */
  val qBpeFertility = Q("q_bpe_fertility",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.ext.Bpe.learn(docs, "text", nMerges = 8)
      // spread: same single-split encode-scan fix as q_bpe_encode
      graft.ext.Materialize.spread(docs).select(col("lang"),
          graft.ext.TextOps.nTokens(col("text")).cast("long").as("__w"),
          size(graft.ext.Bpe.encode(col("text"), merges)).cast("long")
            .as("__b"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__w")).as("total_words"),
          sum(col("__b")).as("total_bpe"))
        .select(col("lang"), col("n_docs"), col("total_words"),
          col("total_bpe"),
          (floor(col("total_bpe").cast("double") / col("total_words")
            * 10000 + 0.5) / 10000).as("fertility"))
    },
    Some(bpeLearnCtes(8) + "," + bpeEncodeCtes + """
      SELECT d.lang, count(*) AS n_docs,
        CAST(sum(len(regexp_extract_all(d.text, '\S+'))) AS BIGINT)
          AS total_words,
        CAST(sum(coalesce(len(a.all_toks), 0)) AS BIGINT) AS total_bpe,
        floor(sum(coalesce(len(a.all_toks), 0))::DOUBLE
          / sum(len(regexp_extract_all(d.text, '\S+'))) * 10000 + 0.5)
          / 10000 AS fertility
      FROM documents d LEFT JOIN agg a USING (doc_id)
      GROUP BY d.lang"""))

  /** Shared oracle CTEs for the unigram-LM tokenizer family
    * ([[graft.ext.Unigram]]): seed vocabulary (within-word substrings
    * ≤ 4 chars, top-200 + all singles, ⌊−ln(cnt/C)·10⁴+0.5⌋ costs) and
    * the per-word Viterbi DP replayed as a RECURSIVE CTE over
    * character positions — dp/backpointer lists accumulate per
    * iteration, candidate lengths 1..4 are vocab LEFT-JOIN lookups
    * (unknown singles cost 200000, the operator's default), cost ties
    * break to the LONGEST piece via the longer-length-first CASE
    * cascade (provably the operator's upward-scan-with-≤ rule), and a
    * second recursion walks the backpointers into the piece list.
    * Exposes `wtok(doc_id, w)`, `vocab(piece, cnt, nat10k)`,
    * `segs(w, wc, pieces)`. Requires `WITH RECURSIVE` (prepended here).
    */
  private[graft] val unigramSegCtes: String = """WITH RECURSIVE
      norm AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        FROM documents),
      wtok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM norm WHERE t <> ''),
      wcnt AS (SELECT w, count(*) AS wc FROM wtok GROUP BY 1),
      sub AS (SELECT w, wc, unnest(flatten(list_transform(generate_series(1, length(w)),
                s -> list_transform(generate_series(1, least(4, length(w) - s + 1)),
                     l -> substr(w, s, l))))) AS piece FROM wcnt),
      cnts AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM sub GROUP BY 1),
      top AS (SELECT piece, cnt FROM cnts ORDER BY cnt DESC, piece ASC LIMIT 200),
      vocab0 AS (SELECT DISTINCT * FROM (
        SELECT piece, cnt FROM top
        UNION ALL SELECT piece, cnt FROM cnts WHERE length(piece) = 1)),
      vocab AS (SELECT piece, cnt,
          CAST(floor(-ln(cnt::DOUBLE / tt.ctot::DOUBLE) * 10000 + 0.5) AS BIGINT) AS nat10k
        FROM vocab0, (SELECT CAST(sum(cnt) AS BIGINT) AS ctot FROM vocab0) tt),
      udw AS (SELECT w, wc, length(w) AS L FROM wcnt),
      seg AS (
        SELECT w, wc, L, 0 AS i, [CAST(0 AS BIGINT)] AS dp,
               CAST([] AS BIGINT[]) AS bp FROM udw
        UNION ALL
        SELECT w, wc, L, i + 1,
               list_append(dp, least(c1, c2, c3, c4)),
               list_append(bp, CASE WHEN c4 <= c3 AND c4 <= c2 AND c4 <= c1 THEN 4
                                    WHEN c3 <= c2 AND c3 <= c1 THEN 3
                                    WHEN c2 <= c1 THEN 2 ELSE 1 END)
        FROM (
          SELECT s.w, s.wc, s.L, s.i, s.dp, s.bp,
            s.dp[s.i + 1] + coalesce(v1.nat10k, 200000) AS c1,
            coalesce(CASE WHEN s.i >= 1 THEN s.dp[s.i] + v2.nat10k END,
              4611686018427387904) AS c2,
            coalesce(CASE WHEN s.i >= 2 THEN s.dp[s.i - 1] + v3.nat10k END,
              4611686018427387904) AS c3,
            coalesce(CASE WHEN s.i >= 3 THEN s.dp[s.i - 2] + v4.nat10k END,
              4611686018427387904) AS c4
          FROM seg s
          LEFT JOIN vocab v1 ON v1.piece = substr(s.w, s.i + 1, 1)
          LEFT JOIN vocab v2 ON s.i >= 1 AND v2.piece = substr(s.w, s.i, 2)
          LEFT JOIN vocab v3 ON s.i >= 2 AND v3.piece = substr(s.w, s.i - 1, 3)
          LEFT JOIN vocab v4 ON s.i >= 3 AND v4.piece = substr(s.w, s.i - 2, 4)
          WHERE s.i < s.L
        )
      ),
      segf AS (SELECT w, wc, L, bp FROM seg WHERE i = L),
      back AS (
        SELECT w, wc, CAST(L AS BIGINT) AS pos, bp,
               CAST([] AS VARCHAR[]) AS pieces FROM segf
        UNION ALL
        SELECT w, wc, pos - bp[CAST(pos AS INT)], bp,
               list_prepend(substr(w, CAST(pos - bp[CAST(pos AS INT)] + 1 AS INT),
                 CAST(bp[CAST(pos AS INT)] AS INT)), pieces)
        FROM back WHERE pos > 0
      ),
      segs AS (SELECT w, wc, pieces FROM back WHERE pos = 0)"""

  /** Unigram-LM tokenizer, LEARN surface ([[graft.ext.Unigram]]): one
    * hard-EM round over the seed vocabulary — segment the corpus by
    * Viterbi under seed costs, count piece usage over word occurrences,
    * re-estimate costs from the usage mass (Viterbi-unused seeds prune
    * out). The oracle replays seeding, the full per-word Viterbi DP,
    * AND the re-estimation in DuckDB (see [[unigramSegCtes]]).
    */
  val qUnigramLearn = Q("q_unigram_learn",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ext.Unigram.emRound(docs, "text",
        graft.ext.Unigram.seedVocab(docs, "text"))
    },
    Some(unigramSegCtes + """,
      usage AS (SELECT wc, unnest(pieces) AS piece FROM segs),
      ucnt AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt FROM usage GROUP BY 1)
      SELECT piece, cnt,
        CAST(floor(-ln(cnt::DOUBLE / tt.ctot::DOUBLE) * 10000 + 0.5) AS BIGINT) AS nat10k
      FROM ucnt, (SELECT CAST(sum(cnt) AS BIGINT) AS ctot FROM ucnt) tt"""))

  /** Unigram-LM tokenizer, ENCODE surface: per-document fertility under
    * the seed vocabulary ([[graft.ext.Unigram.fertility]]) — the
    * tokenizer-family sibling of `q_bpe_fertility`, so BPE-vs-unigram
    * pieces-per-word compare on identical text. Every Viterbi
    * segmentation decision is oracle-replayed per distinct word and
    * joined back over the document token stream.
    */
  val qUnigramEncode = Q("q_unigram_encode",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ext.Unigram.fertility(docs, "doc_id", "text",
          graft.ext.Unigram.seedVocab(docs, "text"))
        .withColumnRenamed("id", "doc_id")
    },
    Some(unigramSegCtes + """,
      wp AS (SELECT w, len(pieces) AS np FROM segs),
      agg AS (SELECT tk.doc_id, count(*) AS n_words,
              CAST(sum(p.np) AS BIGINT) AS n_pieces
              FROM wtok tk JOIN wp p USING (w) GROUP BY 1)
      SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
             coalesce(a.n_pieces, 0) AS n_pieces,
             CASE WHEN coalesce(a.n_words, 0) > 0
                  THEN a.n_pieces * 10000 // a.n_words ELSE 0 END AS fertility_bp
      FROM documents d LEFT JOIN agg a USING (doc_id)"""))

  /** SUBWORD-REGULARIZATION sampling ([[graft.ext.Unigram.sampleEncode]],
    * Kudo 2018 §3.2 — the n-best draw SentencePiece ships as
    * `nbest_size > 1`): per word occurrence, one P^α-weighted draw from
    * the word's 3-best segmentations, bit-replayable (integer k-best
    * DP, fixed-point weights, md5-prefix draw). The oracle replays the
    * ENTIRE path in DuckDB: the k-best DP as a recursive CTE carrying
    * per-position rank lists (costs + (len, prevRank) backpointers,
    * candidate order (cost, −len, rank)), the per-rank backtrack, the
    * ⌊exp(−α·Δnat)·10⁶+0.5⌋ weights, and the
    * hash("word:occ:seed") mod Σw draw — alongside the 1-best columns
    * (the existing Viterbi CTEs), so the sampled-vs-1-best fertility
    * gap is value-pinned per document.
    */
  val qUnigramSample = Q("q_unigram_sample",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.ext.Unigram.fertilitySampled(docs, "doc_id", "text",
          graft.ext.Unigram.seedVocab(docs, "text"),
          nBest = 3, alpha10k = 5000L, seed = "r15")
        .withColumnRenamed("id", "doc_id")
    },
    Some(unigramSegCtes + """,
      wp AS (SELECT w, len(pieces) AS np FROM segs),
      agg AS (SELECT tk.doc_id, count(*) AS n_words,
              CAST(sum(p.np) AS BIGINT) AS n_pieces
              FROM wtok tk JOIN wp p USING (w) GROUP BY 1),
      -- ===== k-best DP (k = 3): dpz[p+1] = rank costs at position p,
      -- bpz[p+1] = (len, prevRank) per rank, candidate order
      -- (cost asc, len desc [nl = -len], rank asc) =====
      kseg AS (
        SELECT w, L, 0 AS i,
               [[CAST(0 AS BIGINT)]] AS dpz,
               [CAST([] AS STRUCT(l BIGINT, r BIGINT)[])] AS bpz
        FROM udw
        UNION ALL
        SELECT w, L, i + 1,
               list_append(dpz, list_transform(top3,
                 x -> struct_extract(x, 'c'))),
               list_append(bpz, list_transform(top3,
                 x -> struct_pack(l := -struct_extract(x, 'nl'),
                                  r := struct_extract(x, 'r'))))
        FROM (
          SELECT w, L, i, dpz, bpz,
                 list_sort(flatten([c1l, c2l, c3l, c4l]))[1:3] AS top3
          FROM (
            SELECT s.w, s.L, s.i, s.dpz, s.bpz,
              list_transform(generate_series(1, len(s.dpz[s.i + 1])), r ->
                struct_pack(c := s.dpz[s.i + 1][r]
                              + coalesce(v1.nat10k, 200000),
                            nl := CAST(-1 AS BIGINT), r := r)) AS c1l,
              CASE WHEN s.i >= 1 AND v2.nat10k IS NOT NULL THEN
                list_transform(generate_series(1, len(s.dpz[s.i])), r ->
                  struct_pack(c := s.dpz[s.i][r] + v2.nat10k,
                              nl := CAST(-2 AS BIGINT), r := r))
                ELSE CAST([] AS STRUCT(c BIGINT, nl BIGINT, r BIGINT)[])
              END AS c2l,
              CASE WHEN s.i >= 2 AND v3.nat10k IS NOT NULL THEN
                list_transform(generate_series(1, len(s.dpz[s.i - 1])), r ->
                  struct_pack(c := s.dpz[s.i - 1][r] + v3.nat10k,
                              nl := CAST(-3 AS BIGINT), r := r))
                ELSE CAST([] AS STRUCT(c BIGINT, nl BIGINT, r BIGINT)[])
              END AS c3l,
              CASE WHEN s.i >= 3 AND v4.nat10k IS NOT NULL THEN
                list_transform(generate_series(1, len(s.dpz[s.i - 2])), r ->
                  struct_pack(c := s.dpz[s.i - 2][r] + v4.nat10k,
                              nl := CAST(-4 AS BIGINT), r := r))
                ELSE CAST([] AS STRUCT(c BIGINT, nl BIGINT, r BIGINT)[])
              END AS c4l
            FROM kseg s
            LEFT JOIN vocab v1 ON v1.piece = substr(s.w, s.i + 1, 1)
            LEFT JOIN vocab v2 ON s.i >= 1 AND v2.piece = substr(s.w, s.i, 2)
            LEFT JOIN vocab v3 ON s.i >= 2 AND v3.piece = substr(s.w, s.i - 1, 3)
            LEFT JOIN vocab v4 ON s.i >= 3 AND v4.piece = substr(s.w, s.i - 2, 4)
            WHERE s.i < s.L
          )
        )
      ),
      ksegf AS (SELECT w, L, dpz[L + 1] AS kc, bpz FROM kseg WHERE i = L),
      -- per-rank backtrack: piece count of the j-th best segmentation
      kback AS (
        SELECT w, j, CAST(L AS BIGINT) AS pos, CAST(j AS BIGINT) AS r,
               bpz, 0 AS np
        FROM ksegf, LATERAL (
          SELECT unnest(generate_series(1, len(kc))) AS j)
        UNION ALL
        SELECT w, j,
               pos - struct_extract(
                 bpz[CAST(pos AS INT) + 1][CAST(r AS INT)], 'l'),
               struct_extract(
                 bpz[CAST(pos AS INT) + 1][CAST(r AS INT)], 'r'),
               bpz, np + 1
        FROM kback WHERE pos > 0
      ),
      knp AS (SELECT w, j, np FROM kback WHERE pos = 0),
      -- P^alpha weights in fixed point (alpha10k = 5000) + the draw
      kw AS (SELECT w,
               list_transform(generate_series(1, len(kc)), j ->
                 CAST(floor(exp(-(kc[j] - kc[1])::DOUBLE * 5000
                   / 100000000) * 1000000 + 0.5) AS BIGINT)) AS wt
             FROM ksegf),
      wtoki AS (SELECT doc_id, i, ws[CAST(i AS INT)] AS w FROM (
          SELECT doc_id, string_split(t, ' ') AS ws FROM norm
          WHERE t <> ''), LATERAL (
          SELECT unnest(generate_series(1, len(ws))) AS i)),
      chosen AS (SELECT doc_id, i, w,
               1 + len(list_filter(generate_series(1, len(wt)), j ->
                 list_aggregate(wt[1:CAST(j AS INT)], 'sum') <= t)) AS j
             FROM (SELECT o.doc_id, o.i, o.w, k.wt,
                     ('0x' || substr(md5(o.w || ':'
                       || CAST(o.i - 1 AS STRING) || ':r15'), 1, 15))::BIGINT
                       % list_aggregate(k.wt, 'sum') AS t
                   FROM wtoki o JOIN kw k USING (w))),
      sagg AS (SELECT c.doc_id,
               CAST(sum(n.np) AS BIGINT) AS n_pieces_sampled
             FROM chosen c JOIN knp n ON n.w = c.w AND n.j = c.j
             GROUP BY 1)
      SELECT d.doc_id, coalesce(a.n_words, 0) AS n_words,
             coalesce(a.n_pieces, 0) AS n_pieces,
             coalesce(sa.n_pieces_sampled, 0) AS n_pieces_sampled,
             CASE WHEN coalesce(a.n_words, 0) > 0
                  THEN a.n_pieces * 10000 // a.n_words ELSE 0
             END AS fertility_bp,
             CASE WHEN coalesce(a.n_words, 0) > 0
                  THEN sa.n_pieces_sampled * 10000 // a.n_words ELSE 0
             END AS fertility_sampled_bp
      FROM documents d LEFT JOIN agg a USING (doc_id)
      LEFT JOIN sagg sa USING (doc_id)"""))

  /** TOKENIZER-FAMILY fertility card — the comparison the two fertility
    * surfaces exist for, in one relation: per (lang, family), words vs
    * pieces under the LEARNED BPE table (8 merges, `q_bpe_fertility`'s
    * machinery) and under the unigram-LM seed vocabulary
    * ([[graft.ext.Unigram.fertility]]). A language one family
    * under-serves shows as a fertility gap in the same row group — the
    * number that decides a tokenizer family for a multilingual mix.
    * The oracle replays BOTH tokenizers end to end (BPE learn+encode
    * CTEs and the recursive-CTE Viterbi) in one SQL.
    */
  val qTokenizerFertility = Q("q_tokenizer_fertility",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val merges = graft.ext.Bpe.learn(docs, "text", nMerges = 8)
      // spread: same single-split encode-scan fix as q_bpe_encode
      val bpe = graft.ext.Materialize.spread(docs).select(col("lang"),
          TextOps.nTokens(col("text")).cast("long").as("__w"),
          size(graft.ext.Bpe.encode(col("text"), merges)).cast("long")
            .as("__p"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("total_words"),
          sum(col("__p")).as("total_pieces"))
      val fert = graft.ext.Unigram.fertility(docs, "doc_id", "text",
          graft.ext.Unigram.seedVocab(docs, "text"))
        .withColumnRenamed("id", "doc_id")
      val uni = docs.select(col("doc_id"), col("lang"))
        .join(fert, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("total_words"),
          sum(col("n_pieces")).as("total_pieces"))
      def shaped(df: DataFrame, family: String) = df.select(col("lang"),
        lit(family).as("family"), col("n_docs"), col("total_words"),
        col("total_pieces"),
        (floor(col("total_pieces").cast("double") / col("total_words")
          * 10000 + 0.5) / 10000).as("fertility"))
      shaped(bpe, "bpe").unionByName(shaped(uni, "unigram"))
    },
    Some(unigramSegCtes + "," +
      bpeLearnCtes(8).stripPrefix("WITH ") + "," + bpeEncodeCtes + """,
      uwp AS (SELECT w, len(pieces) AS np FROM segs),
      uagg AS (SELECT tk.doc_id, count(*) AS n_words,
              CAST(sum(p.np) AS BIGINT) AS n_pieces
              FROM wtok tk JOIN uwp p USING (w) GROUP BY 1)
      SELECT d.lang, 'bpe' AS family, count(*) AS n_docs,
        CAST(sum(len(regexp_extract_all(d.text, '\S+'))) AS BIGINT)
          AS total_words,
        CAST(sum(coalesce(len(a.all_toks), 0)) AS BIGINT) AS total_pieces,
        floor(sum(coalesce(len(a.all_toks), 0))::DOUBLE
          / sum(len(regexp_extract_all(d.text, '\S+'))) * 10000 + 0.5)
          / 10000 AS fertility
      FROM documents d LEFT JOIN agg a USING (doc_id)
      GROUP BY d.lang
      UNION ALL
      SELECT d.lang, 'unigram', count(*),
        CAST(sum(coalesce(a.n_words, 0)) AS BIGINT),
        CAST(sum(coalesce(a.n_pieces, 0)) AS BIGINT),
        floor(sum(coalesce(a.n_pieces, 0))::DOUBLE
          / sum(coalesce(a.n_words, 0)) * 10000 + 0.5) / 10000
      FROM documents d LEFT JOIN uagg a USING (doc_id)
      GROUP BY d.lang"""))

  /** Fraction-based decontamination: the published-eval policy form —
    * per doc, bp of its distinct word bigrams that appear anywhere in
    * the benchmark slice, with the ≥ 2500 bp drop verdict. Portable
    * md5-prefix shingle hashes keep even collisions engine-identical.
    */
  val qDecontamFraction = Q("q_decontam_fraction",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.decontaminateFraction(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 2, dropAtBp = 2500)
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_shared"),
          col("overlap_bp"), col("drop"))
    },
    Some("""WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(
            len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' '))-1, 0)),
          i -> array_to_string(
            string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')[i:i+1], ' ')))
          AS sset
        FROM documents),
      ex0 AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
      ex AS (SELECT doc_id,
               ('0x'||substr(md5(shingle),1,15))::BIGINT AS h
             FROM ex0),
      bench AS (SELECT DISTINCT h FROM ex WHERE doc_id % 97 = 0),
      scored AS (
        SELECT doc_id, count(*) AS n_shingles,
          count(CASE WHEN h IN (SELECT h FROM bench) THEN 1 END) AS n_shared
        FROM ex WHERE doc_id % 97 <> 0 GROUP BY doc_id)
      SELECT d.doc_id,
        coalesce(s.n_shingles, 0) AS n_shingles,
        coalesce(s.n_shared, 0) AS n_shared,
        CASE WHEN coalesce(s.n_shingles, 0) > 0
          THEN (s.n_shared * 10000) // s.n_shingles ELSE 0 END AS overlap_bp,
        (CASE WHEN coalesce(s.n_shingles, 0) > 0
          THEN (s.n_shared * 10000) // s.n_shingles ELSE 0 END) >= 2500 AS "drop"
      FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
      LEFT JOIN scored s USING (doc_id)"""))

  /** Containment-direction decontamination
    * ([[Corpus.decontaminateContainment]]): per doc, the MAX fraction
    * of any benchmark ITEM's bigrams present in the doc — catches the
    * short-eval-item-inside-long-page leak the fraction form (which
    * denominates on the doc) structurally dilutes below threshold.
    * Benchmark slice `% 31` so the ≥ 8000 bp verdict actually fires at
    * sf0.01 (one full 10000 bp containment in the fixture).
    */
  val qDecontamContainment = Q("q_decontam_containment",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Corpus.decontaminateContainment(
        docs.filter(col("doc_id") % 31 =!= 0),
        docs.filter(col("doc_id") % 31 === 0),
        "doc_id", "text", n = 2, dropAtBp = 8000)
        .select(col("id").as("doc_id"), col("max_cont_bp"),
          col("worst_bench"), col("drop"))
    },
    Some("""WITH sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(
            len(string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' '))-1, 0)),
          i -> array_to_string(
            string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')[i:i+1], ' ')))
          AS sset
        FROM documents),
      ex0 AS (SELECT doc_id, unnest(sset) AS shingle FROM sh),
      ex AS (SELECT doc_id,
               ('0x'||substr(md5(shingle),1,15))::BIGINT AS h
             FROM ex0),
      bm AS (SELECT doc_id AS bid, len(sset) AS mb FROM sh
             WHERE doc_id % 31 = 0),
      be AS (SELECT doc_id AS bid, h FROM ex WHERE doc_id % 31 = 0),
      inter AS (
        SELECT c.doc_id, b.bid, m.mb, count(*) AS i
        FROM ex c JOIN be b ON c.h = b.h JOIN bm m ON m.bid = b.bid
        WHERE c.doc_id % 31 <> 0 GROUP BY 1, 2, 3),
      scored AS (
        SELECT doc_id, (i * 10000) // mb AS cont_bp, bid FROM inter),
      best AS (
        SELECT doc_id, cont_bp, bid,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY cont_bp DESC, bid ASC) AS rn
        FROM scored)
      SELECT d.doc_id,
        coalesce(b.cont_bp, 0) AS max_cont_bp,
        b.bid AS worst_bench,
        coalesce(b.cont_bp, 0) >= 8000 AS "drop"
      FROM (SELECT doc_id FROM documents WHERE doc_id % 31 <> 0) d
      LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)"""))

  /** Temperature resampling at alpha = 0.5 (the standard multilingual
    * rebalance): per-source keep rate = sqrt(share ratio) in exact ppm
    * via the integer-sqrt form, admission by portable-hash threshold —
    * the whole mixture reweight hash-certified.
    */
  val qTemperatureSample = Q("q_temperature_sample",
    (s, dir) => Corpus.temperatureSample(t(s, dir, "documents"),
        "source", Seq("doc_id"), alpha = 0.5)
      .select(col("doc_id"), col("source"), col("keep_rate_ppm")),
    Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      m AS (SELECT max(n) AS nmax FROM c),
      r AS (SELECT source,
        CAST(floor(sqrt(
          (((n::HUGEINT) * 1000000 * 1000000) // (SELECT nmax FROM m))::DOUBLE))
          AS BIGINT) AS keep_rate_ppm
        FROM c)
      SELECT d.doc_id, d.source, r.keep_rate_ppm
      FROM documents d JOIN r USING (source)
      WHERE ('0x'||substr(md5(d.doc_id::VARCHAR),1,15))::BIGINT % 1000000
            < r.keep_rate_ppm"""))

  /** Temperature resampling at alpha = 0.25 — the exact-oracle family
    * extended to rational alphas (r9): rate = floor((c/cmax)^(1/4)·ppm)
    * via the DOUBLE integer-sqrt, floor(x^(1/4)) = isqrt(isqrt(⌊x⌋)).
    * The radicand c·ppm⁴/cmax is ≤ ppm⁴ (c ≤ cmax), so the oracle's
    * inner sqrt needs only a ±1 integer correction after the double
    * conversion (abs error on sqrt ≤ ~2·10⁻⁴ at 10¹² scale), and the
    * outer radicand is ≤ ppm² < 2^52 — correctly-rounded IEEE, exact.
    */
  val qTemperatureSampleA25 = Q("q_temperature_sample_a25",
    (s, dir) => Corpus.temperatureSample(t(s, dir, "documents"),
        "source", Seq("doc_id"), alpha = 0.25)
      .select(col("doc_id"), col("source"), col("keep_rate_ppm")),
    Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      m AS (SELECT max(n) AS nmax FROM c),
      rad AS (SELECT source,
          ((n::HUGEINT) * 1000000::HUGEINT * 1000000 * 1000000 * 1000000)
            // (SELECT nmax FROM m) AS radi
        FROM c),
      cand AS (SELECT source, radi,
          CAST(floor(sqrt(radi::DOUBLE)) AS HUGEINT) AS c0 FROM rad),
      i1 AS (SELECT source,
          CASE WHEN (c0+1)*(c0+1) <= radi THEN c0+1
               WHEN c0*c0 <= radi THEN c0 ELSE c0-1 END AS s1
        FROM cand),
      r AS (SELECT source,
          CAST(floor(sqrt(s1::DOUBLE)) AS BIGINT) AS keep_rate_ppm
        FROM i1)
      SELECT d.doc_id, d.source, r.keep_rate_ppm
      FROM documents d JOIN r USING (source)
      WHERE ('0x'||substr(md5(d.doc_id::VARCHAR),1,15))::BIGINT % 1000000
            < r.keep_rate_ppm"""))

  /** Temperature resampling at alpha = 0.75 — same double-isqrt family
    * on the cubed-share radicand c³·ppm⁴/cmax³ (≤ ppm⁴). The 128-bit
    * oracle replay needs the intermediate c³·ppm⁴ < 2^127 (per-stratum
    * counts ≲ 5·10⁴ at ppm = 10⁶ — holds through sf0.1); the operator
    * itself computes in BigInt and has no such bound.
    */
  val qTemperatureSampleA75 = Q("q_temperature_sample_a75",
    (s, dir) => Corpus.temperatureSample(t(s, dir, "documents"),
        "source", Seq("doc_id"), alpha = 0.75)
      .select(col("doc_id"), col("source"), col("keep_rate_ppm")),
    Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      m AS (SELECT max(n) AS nmax FROM c),
      rad AS (SELECT source,
          ((n::HUGEINT) * n * n * 1000000::HUGEINT * 1000000 * 1000000 * 1000000)
            // ((SELECT nmax FROM m)::HUGEINT
               * (SELECT nmax FROM m) * (SELECT nmax FROM m)) AS radi
        FROM c),
      cand AS (SELECT source, radi,
          CAST(floor(sqrt(radi::DOUBLE)) AS HUGEINT) AS c0 FROM rad),
      i1 AS (SELECT source,
          CASE WHEN (c0+1)*(c0+1) <= radi THEN c0+1
               WHEN c0*c0 <= radi THEN c0 ELSE c0-1 END AS s1
        FROM cand),
      r AS (SELECT source,
          CAST(floor(sqrt(s1::DOUBLE)) AS BIGINT) AS keep_rate_ppm
        FROM i1)
      SELECT d.doc_id, d.source, r.keep_rate_ppm
      FROM documents d JOIN r USING (source)
      WHERE ('0x'||substr(md5(d.doc_id::VARCHAR),1,15))::BIGINT % 1000000
            < r.keep_rate_ppm"""))

  /** Mixture sampling: per-source keep rates (the data-mixing step) —
    * up-weight two sources, down-weight two, default the rest.
    */
  val qMixtureSample = Q("q_mixture_sample",
    (s, dir) => Corpus.mixtureSample(t(s, dir, "documents"), "source",
        Seq("doc_id"),
        pctByStratum = Map("src0" -> 80, "src1" -> 80,
          "src2" -> 30, "src3" -> 30),
        defaultPct = 10)
      .select(col("doc_id"), col("source")),
    Some("""SELECT doc_id, source FROM documents
      WHERE ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 100 <
        CASE source WHEN 'src0' THEN 80 WHEN 'src1' THEN 80
                    WHEN 'src2' THEN 30 WHEN 'src3' THEN 30 ELSE 10 END"""))

  /** Weighted sampling without replacement (A-ES exponential keys over
    * the portable hash): longer documents proportionally likelier, the
    * exact sample certified by the oracle replaying the key formula.
    */
  val qWeightedSample = Q("q_weighted_sample",
    (s, dir) => Corpus.weightedSample(t(s, dir, "documents"),
        Seq("doc_id"), col("n_chars"), k = 50)
      .select(col("doc_id"), col("source"), col("n_chars"), col("sample_key")),
    Some("""SELECT doc_id, source, n_chars,
        CAST(floor(-ln((('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT + 1.0)
          / 1152921504606846976.0)
          * (SELECT sum(n_chars)::DOUBLE / count(*) FROM documents WHERE n_chars > 0)
          / n_chars * 1000000.0) AS BIGINT) AS sample_key
      FROM documents WHERE n_chars > 0
      ORDER BY sample_key, doc_id LIMIT 50"""))

}
