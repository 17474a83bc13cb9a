package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.compact.Compaction
import graft.envelope.{DmsCdc, MongoCdc, PgCdc}
import graft.ext.{Corpus, DataQuality, Dedup, Multimodal, Similarity, TextOps, ZOrder}

/** Heavy hitters, PII, quantization, sketches (HLL/KMV/CMS), the
  * window/set/pivot/cube/grouping-sets SQL surface, fuzzy linkage,
  * k-means, data quality, multimodal.
  *
  * One mixin slice of [[Queries]] — split mechanically from the former
  * single Queries.scala (no behavior change); mixin order in `object
  * Queries` preserves the original definition/initialization order.
  */
private[graft] trait QueriesSqlMisc { this: Queries.type =>

  /** Heavy hitters via the Misra-Gries candidate sketch + exact recount.
    * The oracle is the plain exact top-k SQL — a hash match proves the
    * sketch path changes nothing (fixture vocab 31 << capacity, so the
    * sketch is lossless here by the MG bound; FreqSketchSpec exercises
    * real pruning at 10k distinct items).
    */
  val qHeavyHitters = Q("q_heavy_hitters",
    (s, dir) => Corpus.heavyHitters(t(s, dir, "documents"), "text",
      k = 10, capacity = 512),
    Some("""WITH tok AS (
        SELECT unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS token
        FROM documents),
      counts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
      SELECT row_number() OVER (ORDER BY cnt DESC, token) AS rank, token, cnt
      FROM counts ORDER BY rank LIMIT 10"""))

  val qPiiScrub = Q("q_pii_scrub",
    (s, dir) => {
      val (scrubbed, hits) = Corpus.scrub(col("text"))
      t(s, dir, "documents").select(col("doc_id"),
        hits.as("n_hits"), md5(scrubbed).as("fp_scrubbed"))
    },
    Some("""SELECT doc_id,
        len(regexp_extract_all(text, '[0-9]+')) AS n_hits,
        md5(regexp_replace(text, '[0-9]+', '<num>', 'g')) AS fp_scrubbed
      FROM documents"""))

  /** Full PII battery over documents with deterministic synthetic PII
    * injected (the corpus is a clean word salad, so the scrubber must be
    * SHOWN to fire): emails, URLs, IPv4, phone numbers, digit runs —
    * scrubbed in specificity order, hit counts per stage, result
    * certified by fingerprint. All regexes RE2-compatible → the whole
    * battery replays in the oracle.
    */
  val qPiiFull = Q("q_pii_full",
    (s, dir) => {
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact u"), col("doc_id"), lit("@ex.com http://ex.org/p/"),
          col("doc_id"), lit(" ip 10.2."), col("doc_id") % 256,
          lit(".7 tel +1555"), col("doc_id") + 1000000).as("s"))
      val (scrubbed, counts) = Corpus.scrubAll(col("s"))
      withPii.select(col("doc_id") +:
        counts.map { case (n, c) => c.as(s"n_$n") } :+
        md5(scrubbed).as("fp_scrubbed"): _*)
    },
    Some("""WITH t0 AS (
        SELECT doc_id, text || ' contact u' || doc_id || '@ex.com http://ex.org/p/'
          || doc_id || ' ip 10.2.' || (doc_id % 256) || '.7 tel +1555'
          || (doc_id + 1000000) AS s
        FROM documents),
      s1 AS (SELECT doc_id,
          len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
          regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g') AS s
        FROM t0),
      s2 AS (SELECT doc_id, n_email,
          len(regexp_extract_all(s, 'https?://[^\s]+')) AS n_url,
          regexp_replace(s, 'https?://[^\s]+', '<url>', 'g') AS s
        FROM s1),
      s3 AS (SELECT doc_id, n_email, n_url,
          len(regexp_extract_all(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
          regexp_replace(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<ip>', 'g') AS s
        FROM s2),
      s4 AS (SELECT doc_id, n_email, n_url, n_ipv4,
          len(regexp_extract_all(s, '\+\d{7,15}')) AS n_phone,
          regexp_replace(s, '\+\d{7,15}', '<phone>', 'g') AS s
        FROM s3),
      s5 AS (SELECT doc_id, n_email, n_url, n_ipv4, n_phone,
          len(regexp_extract_all(s, '[0-9]+')) AS n_number,
          regexp_replace(s, '[0-9]+', '<num>', 'g') AS s
        FROM s4)
      SELECT doc_id, n_email, n_url, n_ipv4, n_phone, n_number,
        md5(s) AS fp_scrubbed
      FROM s5"""))

  /** Symmetric int8 quantization of the embedding column — the 4×
    * storage/IO shrink for vector corpora — with the int8 values
    * themselves oracle-certified (double-precision scale math + floor
    * rounding is engine-exact; arrays serialized to strings for the
    * hash compare).
    */
  val qQuantize = Q("q_quantize",
    (s, dir) => t(s, dir, "embeddings").select(col("vec_id"),
      concat_ws(",", transform(Similarity.quantizeInt8(col("embedding")),
        _.cast("string"))).as("q8")),
    Some("""WITH scaled AS (
        SELECT vec_id, embedding,
          list_aggregate(list_transform(embedding, x -> abs(x::DOUBLE)), 'max') AS m
        FROM embeddings)
      SELECT vec_id,
        array_to_string(list_transform(embedding,
          x -> CAST(floor(x::DOUBLE * 127 / m + 0.5) AS INT)), ',') AS q8
      FROM scaled"""))

  /** Analytic-window breadth: lag/lead/ntile/percent_rank/cume_dist in
    * one deterministic ordering (ts then event_id). Rank fractions are
    * small-integer divisions — identical IEEE results in both engines —
    * rounded at 6dp for safety. */
  val qWindowFuncs = Q("q_window_funcs",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        lag(col("value"), 1).over(w).as("prev_v"),
        lead(col("value"), 1).over(w).as("next_v"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
    },
    Some("""SELECT user_id, event_id,
        lag(value) OVER w AS prev_v, lead(value) OVER w AS next_v,
        ntile(4) OVER w AS quartile,
        round(percent_rank() OVER w, 6) AS pct_rank,
        round(cume_dist() OVER w, 6) AS cume
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""))

  /** Window frames beyond running totals: a 90-day RANGE-interval frame
    * (peer rows by VALUE, not position) plus first/last/nth_value over
    * an explicit unbounded frame. */
  val qWindowFrames = Q("q_window_frames",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_wf")
      s.sql("""SELECT o_orderkey, o_custkey,
          round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
            RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW), 2) AS sum90d,
          round(first_value(o_totalprice) OVER w, 2) AS first_p,
          round(last_value(o_totalprice) OVER w, 2) AS last_p,
          round(nth_value(o_totalprice, 2) OVER w, 2) AS second_p
        FROM orders_wf
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")
    },
    Some("""SELECT o_orderkey, o_custkey,
        round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW), 2) AS sum90d,
        round(first_value(o_totalprice) OVER w, 2) AS first_p,
        round(last_value(o_totalprice) OVER w, 2) AS last_p,
        round(nth_value(o_totalprice, 2) OVER w, 2) AS second_p
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))

  /** Set operations: INTERSECT / EXCEPT on yearly customer cohorts. */
  val qSetOps = Q("q_set_ops",
    (s, dir) => {
      val o = t(s, dir, "orders")
      // each cohort feeds both set ops: materialize once (lazy cache on
      // the tiny distinct sets) instead of re-scanning orders 4x
      def cohort(y: Int) = ext.Materialize.multiScan(
        o.filter(year(col("o_orderdate")) === y)
          .select(col("o_custkey")).distinct())
      val c95 = cohort(1995)
      val c96 = cohort(1996)
      c95.intersect(c96)
        .select(lit("both").as("tag"), col("o_custkey"))
        .unionByName(c95.except(c96)
          .select(lit("only95").as("tag"), col("o_custkey")))
    },
    Some("""WITH c95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
      c96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM c95 INTERSECT SELECT o_custkey FROM c96)
      UNION ALL
      SELECT 'only95' AS tag, o_custkey FROM (SELECT o_custkey FROM c95 EXCEPT SELECT o_custkey FROM c96)"""))

  /** Pivot: per-user event-type counts as columns. */
  val qPivot = Q("q_pivot",
    (s, dir) => t(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count().na.fill(0L),
    Some("""SELECT user_id,
        count(CASE WHEN event_type='click' THEN 1 END) AS click,
        count(CASE WHEN event_type='error' THEN 1 END) AS error,
        count(CASE WHEN event_type='purchase' THEN 1 END) AS purchase,
        count(CASE WHEN event_type='signup' THEN 1 END) AS signup,
        count(CASE WHEN event_type='view' THEN 1 END) AS view
      FROM events GROUP BY user_id"""))

  /** CUBE aggregation (all grouping-set combinations). Two-phase: the
    * raw relation is aggregated to the finest grouping ONCE, and cube's
    * Expand (which multiplies its input by the number of grouping sets)
    * runs over those few rows instead of the full table — sums of sums
    * and sums of counts are exact, and at 100 TB this is the difference
    * between scanning the table once and four times. */
  val qCube = Q("q_cube",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("cnt"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("sq")), 2).as("qty"), sum(col("cnt")).as("n")),
    Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity),2) AS qty, count(*) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** Fuzzy (edit-distance) matching: near-identical part names within a
    * brand block — the classic blocked record-linkage shape; the block
    * key bounds the pair space, levenshtein is unit-cost in both engines. */
  val qFuzzyPairs = Q("q_fuzzy_pairs",
    (s, dir) => {
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          length(col("p_name")).as("len"))
      // the probe side arrives as a single ~MB parquet split, which
      // would run the whole pair enumeration + levenshtein in ONE task;
      // spread it explicitly (REPARTITION_BY_NUM shuffles are exempt
      // from AQE coalescing, which would happily fold 1 MB back into
      // one partition). 4x cores saturates the pool even with skewed
      // (brand, len) blocks.
      val nSlices = s.sparkContext.defaultParallelism * 4
      val a = p.repartition(nSlices, col("p_partkey")).as("a")
      // the |len diff| <= 3 prune as a JOIN KEY, not a post-enumeration
      // filter: side b probes every length within the edit radius
      // (edit distance <= 3 forces |len(a)-len(b)| <= 3), so the equi
      // key (brand, len) confines pair enumeration to length-compatible
      // rows — the quadratic blowup happens per (brand, length) bucket
      // instead of per brand, and each qualifying pair matches exactly
      // once (b has one length; a's length hits one probe value).
      val b = p.withColumn("probe_len",
          explode(sequence(col("len") - 3, col("len") + 3)))
        .as("b")
      // the natural `levenshtein <= 3` predicate: BoundedLevenshteinRule
      // rewrites it to the thresholded banded-DP form during
      // optimization, and running it INSIDE the join predicate means
      // non-matches die during the join — the candidate set is never
      // materialized; dist is recomputed only for survivors.
      a.join(b, col("a.p_brand") === col("b.p_brand") &&
          col("a.len") === col("b.probe_len") &&
          col("a.p_partkey") < col("b.p_partkey") &&
          levenshtein(col("a.p_name"), col("b.p_name")) <= 3)
        .select(col("a.p_partkey").as("id_a"), col("b.p_partkey").as("id_b"),
          levenshtein(col("a.p_name"), col("b.p_name"), 3).as("dist"))
    },
    Some("""SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        levenshtein(a.p_name, b.p_name) AS dist
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 3"""))

  /** Sorted-neighborhood linkage: candidates are the 5 successors in
    * p_name order — O(n·w) pairs instead of per-block quadratic, the
    * scale path when blocks are too coarse (cf. q_fuzzy_pairs). */
  val qFuzzySnm = Q("q_fuzzy_snm",
    (s, dir) => {
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      Corpus.sortedNeighborhood(p, Seq("p_name"), "p_partkey", window = 5)
        .select(col("a.p_partkey").as("id_a"), col("b.p_partkey").as("id_b"),
          levenshtein(col("a.p_name"), col("b.p_name"), 3).as("dist"))
        .filter(col("dist") >= 0)
    },
    Some("""WITH ranked AS (
        SELECT p_partkey, p_name,
               row_number() OVER (ORDER BY p_name, p_partkey) AS rn
        FROM part)
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             levenshtein(a.p_name, b.p_name) AS dist
      FROM ranked a JOIN ranked b ON b.rn > a.rn AND b.rn <= a.rn + 5
      WHERE levenshtein(a.p_name, b.p_name) <= 3"""))

  /** Array-function breadth over tokenized documents (arrays serialized
    * to strings for the hash compare: engines stringify arrays
    * differently, joined strings identically). */
  val qArrayFuncs = Q("q_array_funcs",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"),
        split(TextOps.normalized(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        concat_ws(",", slice(sort_array(col("toks")), 1, 3)).as("first3_sorted"),
        array_contains(col("toks"), "the").cast("int").as("has_the"),
        concat_ws(",", slice(col("toks"), 1, 2)).as("first2"),
        element_at(col("toks"), -1).as("last_tok")),
    Some("""WITH b AS (
        SELECT doc_id,
          string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS toks
        FROM documents)
      SELECT doc_id, len(toks) AS n,
        len(list_distinct(toks)) AS n_uniq,
        array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted,
        CAST(list_contains(toks, 'the') AS INT) AS has_the,
        array_to_string(toks[1:2], ',') AS first2,
        toks[-1] AS last_tok
      FROM b"""))

  /** Correlated subqueries (EXISTS + scalar) through the SQL surface —
    * Catalyst rewrites these to semi-joins / single-row aggregates. */
  val qSubqueries = Q("q_subqueries",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      t(s, dir, "customer").createOrReplaceTempView("customer_sq")
      s.sql("""
        SELECT c.c_custkey, c.c_mktsegment,
          (SELECT count(*) FROM orders_sq o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer_sq c
        WHERE EXISTS (SELECT 1 FROM orders_sq o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)""")
    },
    Some("""SELECT c.c_custkey, c.c_mktsegment,
        (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)"""))

  /** Salted skew join ≡ plain join (the oracle is the unsalted SQL):
    * correctness certificate for the explicit skew tool in
    * [[graft.ext.Layout.saltedJoin]]. */
  val qSaltedJoin = Q("q_salted_join",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val o = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.ext.Layout.saltedJoin(li, o, "l_orderkey", salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
        round(sum(l_extendedprice), 2) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority"""))

  /** Key-skew diagnostic card ([[graft.ext.Layout.skewCard]]) over the
    * event stream's user key — the measurement that decides between a
    * plain join, AQE skew handling, and `saltedJoin`. Percentiles of
    * the per-key count distribution replay Spark's interpolation
    * formula; shares are exact integer ppm.
    */
  val qSkewCard = Q("q_skew_card",
    (s, dir) => graft.ext.Layout.skewCard(t(s, dir, "events"),
      Seq("user_id")),
    Some("""WITH c AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY 1),
      s AS (SELECT list(CAST(n AS DOUBLE) ORDER BY n) AS xs,
              count(*) AS nk, CAST(sum(n) AS BIGINT) AS nr,
              CAST(max(n) AS BIGINT) AS mx
            FROM c),
      m AS (
        SELECT p.p, xs, nk, nr, mx, p.p::DOUBLE * (nk - 1) AS h,
          CAST(floor(p.p::DOUBLE * (nk - 1)) AS BIGINT) AS lo,
          ceil(p.p::DOUBLE * (nk - 1)) AS hi
        FROM s CROSS JOIN (SELECT unnest([0.5, 0.99]) AS p) p),
      v AS (
        SELECT p, nk, nr, mx,
          CASE WHEN hi = lo THEN xs[lo + 1]
               ELSE (hi - h) * xs[lo + 1] + (h - lo) * xs[lo + 2]
          END AS q
        FROM m),
      w AS (
        SELECT any_value(nr) AS n_rows, any_value(nk) AS n_keys,
          any_value(mx) AS max_key_n,
          max(CASE WHEN p = 0.5 THEN q END) AS p50,
          max(CASE WHEN p = 0.99 THEN q END) AS p99
        FROM v)
      SELECT n_rows, n_keys, max_key_n,
        (max_key_n * 1000000) // n_rows AS top1_share_ppm,
        floor(p50 * 100 + 0.5) / 100 AS p50_key_n,
        floor(p99 * 100 + 0.5) / 100 AS p99_key_n,
        floor(max_key_n::DOUBLE / p50 * 100 + 0.5) / 100 AS skew_ratio
      FROM w"""))

  /** UNPIVOT (wide→long melt) via `stack`: per-part numeric attributes
    * become (attribute, value) rows — the normalization step before
    * generic per-metric aggregation. */
  val qUnpivot = Q("q_unpivot",
    (s, dir) => t(s, dir, "part")
      .select(col("p_partkey"), expr(
        "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (attr, val)"))
      .groupBy(col("attr"))
      .agg(count(lit(1)).as("n"), round(sum(col("val")), 2).as("total")),
    Some("""SELECT attr, count(*) AS n, round(sum(val), 2) AS total
      FROM (
        SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
        UNION ALL
        SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part)
      GROUP BY attr"""))

  /** Explicit GROUPING SETS (beyond rollup/cube), via the SQL surface. */
  val qGroupingSets = Q("q_grouping_sets",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
          round(sum(l_quantity), 2) AS qty, count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS qty, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"""))

  /** Stratified quota sample: exactly 50 rows per returnflag, selected
    * by portable-hash order — deterministic balanced subsetting. */
  val qStratified = Q("q_stratified_sample",
    (s, dir) => Corpus.quotaSample(t(s, dir, "lineitem"),
        Seq("l_returnflag"), Seq("l_orderkey", "l_linenumber"), quota = 50)
      .select(col("l_returnflag"), col("sample_rank"),
        col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_returnflag, sample_rank, l_orderkey, l_linenumber FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber,
          row_number() OVER (PARTITION BY l_returnflag
            ORDER BY ('0x'||substr(md5(l_orderkey||':'||l_linenumber),1,15))::BIGINT,
                     l_orderkey, l_linenumber) AS sample_rank
        FROM lineitem) WHERE sample_rank <= 50"""))

  /** K-means (Lloyd, cosine assignment, deterministic init): float
    * centroid means aren't portably reproducible, so the fitted cells
    * have no portable oracle — instead the query is PROPERTY-CHECKED on
    * two invariants the oracle asserts literally TRUE:
    *  - per-iteration objective monotonicity (spherical-k-means: both
    *    Lloyd half-steps are non-decreasing in Σ cos(x, c_assign(x)),
    *    see [[Similarity.kmeansFit]]), with a relative-epsilon guard so
    *    benign float accumulation noise can't flap the boolean;
    *  - assignment consistency: the native [[graft.functions
    *    .NearestCentroid]] argmax over the trained centroids agrees
    *    row-for-row with an independent compositional argmax (explode +
    *    window rank — the q_kmeans_assign machinery) on the same
    *    centroids.
    * A Lloyd-update or argmax regression flips the hash. n_points keeps
    * an exact oracle-checkable count in the row. */
  val qKmeans = Q("q_kmeans",
    (s, dir) => {
      import s.implicits._
      val e = t(s, dir, "embeddings")
      val corpus = e.select(col("vec_id").as("id"), col("embedding"))
      val maxIter = 3
      val (cents, objs) = Similarity.kmeansFit(corpus, k = 8, maxIter = maxIter)
      val monotone = objs.sliding(2).map { w =>
        w(1) >= w(0) - 1e-9 * math.max(1.0, math.abs(w(0))) }.toSeq
      val idx = cents.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val native = corpus.withColumn("cell_n",
        graft.functions.VectorFunctions.nearestCentroid(col("embedding"), idx))
      val centsDf = idx.toSeq.toDF("c", "cent")
      val comp = corpus.crossJoin(broadcast(centsDf))
        .withColumn("rn", row_number().over(Window.partitionBy(col("id"))
          .orderBy(Similarity.cosine(col("embedding"), col("cent")).desc,
                   col("c").asc)))
        .filter(col("rn") === 1).select(col("id"), col("c").as("cell_c"))
      val mism = native.join(comp, "id")
        .agg(sum(when(col("cell_n") === col("cell_c"), 0L).otherwise(1L))
          .as("mism"))
      val nPoints = corpus.agg(count(lit(1)).as("n_points"))
      val iters = (1 to maxIter).map(i => (i.toLong, monotone(i - 1)))
        .toDF("iter", "obj_nondecreasing")
      iters.crossJoin(broadcast(nPoints)).crossJoin(broadcast(mism))
        .select(col("iter"), col("obj_nondecreasing"),
          (col("mism") === 0L).as("assign_consistent"), col("n_points"))
    },
    Some("""SELECT i AS iter, TRUE AS obj_nondecreasing,
        TRUE AS assign_consistent,
        (SELECT count(*) FROM embeddings) AS n_points
      FROM range(1, 4) t(i)"""))

  /** The k-means ASSIGNMENT step with a full oracle: `maxIter = 0` pins
    * the centroids to the k lowest-id vectors (the same deterministic
    * seeding q_kmeans's Lloyd loop starts from), so the
    * nearest-centroid argmax — the piece every per-iteration aggregate
    * and every IVF probe reuses — hash-checks in SQL. The float-centroid
    * Lloyd path stays covered by q_kmeans (rows-only) + spec. */
  val qKmeansAssign = Q("q_kmeans_assign",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.kmeans(e.select(col("vec_id").as("id"), col("embedding")),
          k = 8, maxIter = 0)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"))
    },
    Some("""WITH cents AS (
        SELECT embedding AS cent, row_number() OVER (ORDER BY vec_id) - 1 AS c
        FROM embeddings ORDER BY vec_id LIMIT 8),
      assign AS (
        SELECT e.vec_id, c.c,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY CASE WHEN list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) = 0 OR list_dot_product(c.cent::DOUBLE[], c.cent::DOUBLE[]) = 0 THEN 0.0 ELSE list_cosine_similarity(e.embedding::DOUBLE[], c.cent::DOUBLE[]) END DESC,
                     c.c ASC) AS rn
        FROM embeddings e CROSS JOIN cents c)
      SELECT c AS cell, count(*) AS n, min(vec_id) AS min_id
      FROM assign WHERE rn = 1 GROUP BY c"""))

  /** Point-in-time snapshot (time travel): the compacted state of the
    * keyed stream as of a cutoff — latest event per key among those at
    * or before T. The CDC read-side primitive for "what did the table
    * look like on the 15th?". */
  val qTimeTravel = Q("q_time_travel",
    (s, dir) => {
      val cutoffMs = 1705276800000L // 2024-01-15T00:00:00Z
      val ev = t(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
        .filter(col("ts_ms") <= cutoffMs)
      Compaction.latestPerKey(ev, Seq("user_id"), Seq("ts_ms", "event_id"))
        .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
    },
    Some("""SELECT user_id, event_id, ts_ms, event_type FROM (
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        FROM events WHERE epoch_ms(ts) <= 1705276800000) WHERE rn = 1"""))

  /** Data-quality audit: all expectations in one scan/aggregate. */
  val qDataQuality = Q("q_data_quality",
    (s, dir) => DataQuality.audit(t(s, dir, "orders"),
      Seq(
        DataQuality.notNull("n_null_cust", col("o_custkey")),
        DataQuality.inRange("n_bad_price", col("o_totalprice"), 0.01, 1e9),
        DataQuality.matches("n_bad_status", col("o_orderstatus"), "^[A-Z]$")),
      uniqueKeyCols = Seq("o_orderkey")),
    Some("""SELECT count(*) AS n_rows,
        count(CASE WHEN o_custkey IS NULL THEN 1 END) AS n_null_cust,
        count(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.01
                     OR o_totalprice > 1e9 THEN 1 END) AS n_bad_price,
        count(CASE WHEN o_orderstatus IS NULL
                     OR NOT regexp_matches(o_orderstatus, '^[A-Z]$') THEN 1 END) AS n_bad_status,
        count(*) - count(DISTINCT o_orderkey) AS n_dup_key
      FROM orders"""))

  /** Table profiling card ([[DataQuality.profile]], exact mode): per
    * column, exact null count/ppm and distinct count in ONE scan (the
    * approx HLL mode is the 100 TB path, spec-checked against this
    * one's counts).
    */
  val qProfile = Q("q_profile",
    (s, dir) => DataQuality.profile(t(s, dir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")),
    Some("""WITH n AS (SELECT count(*) AS r FROM orders),
      u AS (
        SELECT 1 AS ord, 'o_orderkey' AS col,
          count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_null,
          count(DISTINCT o_orderkey) AS n_distinct FROM orders
        UNION ALL SELECT 2, 'o_custkey',
          count(CASE WHEN o_custkey IS NULL THEN 1 END),
          count(DISTINCT o_custkey) FROM orders
        UNION ALL SELECT 3, 'o_orderstatus',
          count(CASE WHEN o_orderstatus IS NULL THEN 1 END),
          count(DISTINCT o_orderstatus) FROM orders
        UNION ALL SELECT 4, 'o_totalprice',
          count(CASE WHEN o_totalprice IS NULL THEN 1 END),
          count(DISTINCT o_totalprice) FROM orders
        UNION ALL SELECT 5, 'o_orderpriority',
          count(CASE WHEN o_orderpriority IS NULL THEN 1 END),
          count(DISTINCT o_orderpriority) FROM orders)
      SELECT u.col AS "column", (SELECT r FROM n) AS n_rows,
        CAST(u.n_null AS BIGINT) AS n_null,
        CASE WHEN (SELECT r FROM n) > 0
          THEN (u.n_null * 1000000) // (SELECT r FROM n)
          ELSE 0 END AS null_ppm,
        CAST(u.n_distinct AS BIGINT) AS n_distinct
      FROM u"""))

  /** Referential-integrity audit ([[DataQuality.refIntegrity]]): the
    * cross-relation constraint class `q_data_quality`'s row-local
    * checks can't express. Two relationships in one result: orders →
    * customer (clean on TPC-H-shaped data — the zero row is itself the
    * assertion) and lineitem → a SLICED orders parent (every 7th order
    * removed) so the orphan-counting path is exercised with a non-zero
    * answer, not just compiled.
    */
  val qRefIntegrity = Q("q_ref_integrity",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      DataQuality.refIntegrity(li, col("l_orderkey"),
          ord.filter(col("o_orderkey") % 7 =!= 0), col("o_orderkey"),
          "lineitem->orders_sliced")
        .unionByName(DataQuality.refIntegrity(ord, col("o_custkey"),
          cust, col("c_custkey"), "orders->customer"))
    },
    Some("""WITH r1 AS (
        SELECT 'lineitem->orders_sliced' AS relation,
          count(*) AS n_child,
          count(CASE WHEN l.l_orderkey IS NULL THEN 1 END) AS n_null_fk,
          count(CASE WHEN l.l_orderkey IS NOT NULL
                      AND o.o_orderkey IS NULL THEN 1 END) AS n_orphan
        FROM lineitem l
        LEFT JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0) o
          ON l.l_orderkey = o.o_orderkey),
      r2 AS (
        SELECT 'orders->customer' AS relation,
          count(*) AS n_child,
          count(CASE WHEN o.o_custkey IS NULL THEN 1 END) AS n_null_fk,
          count(CASE WHEN o.o_custkey IS NOT NULL
                      AND c.c_custkey IS NULL THEN 1 END) AS n_orphan
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
      u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
      SELECT relation, n_child, n_null_fk, n_orphan,
        CASE WHEN n_child > 0 THEN (n_orphan * 1000000) // n_child
             ELSE 0 END AS orphan_ppm
      FROM u"""))

  /** Robust MAD outlier summary ([[DataQuality.madOutliers]]) per
    * event type: |x − median| > 3·MAD. Median and MAD are EXACT
    * distributed percentiles (Spark's interpolation formula —
    * the oracle replays it over the sorted value list, then again over
    * the sorted absolute deviations), so even the outlier COUNTS are
    * engine-exact; med/mad are hashed at the portable 2dp rounding.
    */
  val qOutliersMad = Q("q_outliers_mad",
    (s, dir) => {
      def r2c(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5) / 100
      DataQuality.madOutliers(t(s, dir, "events"), Seq("event_type"),
          col("value"), tiebreak = Seq(col("event_id")), k = 3.0)
        .select(col("event_type"), col("n"), r2c(col("med")).as("med"),
          r2c(col("mad")).as("mad"), col("n_outliers"))
    },
    Some("""WITH s AS (
        SELECT event_type, list(CAST(value AS DOUBLE) ORDER BY value) AS xs,
          count(*) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1),
      med AS (
        SELECT event_type, n,
          CASE WHEN ceil(0.5::DOUBLE * (n-1)) = floor(0.5::DOUBLE * (n-1))
            THEN xs[CAST(floor(0.5::DOUBLE * (n-1)) AS BIGINT) + 1]
            ELSE (ceil(0.5::DOUBLE * (n-1)) - 0.5::DOUBLE * (n-1))
                   * xs[CAST(floor(0.5::DOUBLE * (n-1)) AS BIGINT) + 1]
               + (0.5::DOUBLE * (n-1) - floor(0.5::DOUBLE * (n-1)))
                   * xs[CAST(floor(0.5::DOUBLE * (n-1)) AS BIGINT) + 2]
          END AS med
        FROM s),
      dev AS (
        SELECT e.event_type, abs(CAST(e.value AS DOUBLE) - m.med) AS d
        FROM events e JOIN med m USING (event_type)
        WHERE e.value IS NOT NULL),
      s2 AS (
        SELECT event_type, list(d ORDER BY d) AS xs, count(*) AS n
        FROM dev GROUP BY 1),
      mad AS (
        SELECT event_type,
          CASE WHEN ceil(0.5::DOUBLE * (n-1)) = floor(0.5::DOUBLE * (n-1))
            THEN xs[CAST(floor(0.5::DOUBLE * (n-1)) AS BIGINT) + 1]
            ELSE (ceil(0.5::DOUBLE * (n-1)) - 0.5::DOUBLE * (n-1))
                   * xs[CAST(floor(0.5::DOUBLE * (n-1)) AS BIGINT) + 1]
               + (0.5::DOUBLE * (n-1) - floor(0.5::DOUBLE * (n-1)))
                   * xs[CAST(floor(0.5::DOUBLE * (n-1)) AS BIGINT) + 2]
          END AS mad
        FROM s2),
      outl AS (
        SELECT d.event_type,
          count(CASE WHEN d.d > 3.0::DOUBLE * m.mad THEN 1 END) AS n_outliers
        FROM dev d JOIN mad m USING (event_type) GROUP BY 1)
      SELECT m2.event_type, s.n,
        floor(m2.med * 100 + 0.5) / 100 AS med,
        floor(m3.mad * 100 + 0.5) / 100 AS mad,
        o.n_outliers
      FROM med m2 JOIN s USING (event_type)
      JOIN mad m3 ON m3.event_type = m2.event_type
      JOIN outl o ON o.event_type = m2.event_type"""))

  /** Two-sided CUSUM changepoint series ([[DataQuality.cusumCounts]])
    * over hourly event counts: did the arrival RATE sustain a shift,
    * and when — the sequential-detection complement of the PSI series
    * (which watches the value distribution, not the level). Dials are
    * SELF-TUNED to the series so the gate stays meaningful at every
    * scale factor (a fixed μ saturates the alarms the moment the rate
    * grows 10×): μ = ⌊total/periods⌋, and since counting noise scales
    * as √μ (Poisson), κ = ⌊√μ⌋ ≈ 1σ and h = 3⌊√μ⌋ ≈ 3σ — the
    * textbook half-σ-per-step/3σ-threshold shape in integer form.
    * Exact integer arithmetic end to end (integer mean, IEEE sqrt of
    * an integer-valued double floors identically in any engine — the
    * temperature-sample isqrt precedent), replayed by the oracle from
    * scratch. Alarms fire without saturating at BOTH gate SFs (17 up
    * at sf0.01; 1 up + 2 down at sf0.1).
    */
  val qCusum = Q("q_cusum",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val st = ev
        .select(expr("unix_millis(ts) div 3600000").as("p"))
        .groupBy(col("p")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("tot"), count(lit(1)).as("np")).head()
      val mu = st.getLong(0) / st.getLong(1)
      val sig = math.floor(math.sqrt(mu.toDouble)).toLong
      DataQuality.cusumCounts(ev, unix_millis(col("ts")),
        periodMs = 3600000L, mu = mu, kappa = sig,
        h = math.max(1L, 3L * sig))
    },
    Some("""WITH s AS (
        SELECT epoch_ms(ts) // 3600000 AS period, count(*) AS n
        FROM events GROUP BY 1),
      m AS (SELECT CAST(sum(n) AS BIGINT) // count(*) AS mu FROM s),
      m2 AS (SELECT mu,
          CAST(floor(sqrt(mu::DOUBLE)) AS BIGINT) AS sig FROM m),
      w1 AS (
        SELECT period, n,
          sum(n - (SELECT mu FROM m2) - (SELECT sig FROM m2))
            OVER (ORDER BY period) AS sp,
          sum((SELECT mu FROM m2) - n - (SELECT sig FROM m2))
            OVER (ORDER BY period) AS sn
        FROM s),
      w AS (
        SELECT period, n, sp, sn,
          min(sp) OVER (ORDER BY period) AS msp,
          min(sn) OVER (ORDER BY period) AS msn
        FROM w1)
      SELECT period, n,
        CAST(sp - least(msp, 0) AS BIGINT) AS cusum_pos,
        CAST(sn - least(msn, 0) AS BIGINT) AS cusum_neg,
        (sp - least(msp, 0)) > greatest(1, 3 * (SELECT sig FROM m2))
          AS alarm_up,
        (sn - least(msn, 0)) > greatest(1, 3 * (SELECT sig FROM m2))
          AS alarm_down
      FROM w"""))

  /** Exact two-sample Kolmogorov–Smirnov ([[DataQuality.ksTest]])
    * between the same even/odd event-stream snapshots as `q_psi_drift`
    * — the dial-free member of the drift family. The statistic is the
    * max of cross-multiplied integer CDF numerators over pooled
    * distinct values, so the oracle replays it with window sums in
    * pure integer arithmetic; the scaled form divides in
    * DECIMAL/HUGEINT (exact in both engines).
    */
  val qKsTest = Q("q_ks_test",
    (s, dir) => {
      val ev = t(s, dir, "events")
      DataQuality.ksTest(ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1), col("value"))
    },
    Some("""WITH r AS (
        SELECT CAST(value AS DOUBLE) AS v FROM events
        WHERE event_id % 2 = 0 AND value IS NOT NULL),
      c AS (
        SELECT CAST(value AS DOUBLE) AS v FROM events
        WHERE event_id % 2 = 1 AND value IS NOT NULL),
      u AS (
        SELECT v, count(*) AS nr, 0 AS nc FROM r GROUP BY v
        UNION ALL
        SELECT v, 0, count(*) FROM c GROUP BY v),
      byv AS (
        SELECT v, CAST(sum(nr) AS BIGINT) AS nr,
          CAST(sum(nc) AS BIGINT) AS nc
        FROM u GROUP BY v),
      t AS (SELECT CAST(sum(nr) AS BIGINT) AS n1,
              CAST(sum(nc) AS BIGINT) AS n2 FROM byv),
      run AS (
        SELECT sum(nr * (SELECT n2 FROM t) - nc * (SELECT n1 FROM t))
          OVER (ORDER BY v) AS s
        FROM byv)
      SELECT (SELECT n1 FROM t) AS n_ref, (SELECT n2 FROM t) AS n_cur,
        CAST(max(abs(s)) AS BIGINT) AS ks_num,
        CAST((CAST(max(abs(s)) AS HUGEINT) * 1000000)
          // ((SELECT n1 FROM t)::HUGEINT * (SELECT n2 FROM t))
          AS BIGINT) AS ks_x1e6
      FROM run"""))

  /** Per-slice KS drift ranking ([[DataQuality.ksBySlice]]): one exact
    * KS statistic per event type, each slice's current vs the SAME
    * slice's reference — "which slice drifted" in one pass, with the
    * running sum as a slice-keyed window (no unkeyed sort).
    */
  val qKsBySlice = Q("q_ks_by_slice",
    (s, dir) => {
      val ev = t(s, dir, "events")
      DataQuality.ksBySlice(ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1), col("value"),
        col("event_type"))
    },
    Some("""WITH r AS (
        SELECT event_type AS slice, CAST(value AS DOUBLE) AS v
        FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL),
      c AS (
        SELECT event_type AS slice, CAST(value AS DOUBLE) AS v
        FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL),
      u AS (
        SELECT slice, v, count(*) AS nr, 0 AS nc FROM r GROUP BY 1, 2
        UNION ALL
        SELECT slice, v, 0, count(*) FROM c GROUP BY 1, 2),
      byv AS (
        SELECT slice, v, CAST(sum(nr) AS BIGINT) AS nr,
          CAST(sum(nc) AS BIGINT) AS nc
        FROM u GROUP BY 1, 2),
      t AS (SELECT slice, CAST(sum(nr) AS BIGINT) AS n_ref,
              CAST(sum(nc) AS BIGINT) AS n_cur FROM byv GROUP BY 1),
      run AS (
        SELECT b.slice,
          sum(b.nr * t.n_cur - b.nc * t.n_ref)
            OVER (PARTITION BY b.slice ORDER BY b.v) AS s
        FROM byv b JOIN t USING (slice)),
      m AS (SELECT slice, CAST(max(abs(s)) AS BIGINT) AS num
            FROM run GROUP BY 1)
      SELECT m.slice, t.n_ref, t.n_cur,
        CASE WHEN t.n_ref > 0 AND t.n_cur > 0 THEN m.num END AS ks_num,
        CASE WHEN t.n_ref > 0 AND t.n_cur > 0 THEN
          CAST((m.num::HUGEINT * 1000000)
            // (t.n_ref::HUGEINT * t.n_cur) AS BIGINT) END AS ks_x1e6
      FROM m JOIN t USING (slice)"""))

  /** PSI drift between two event-stream snapshots
    * ([[DataQuality.psi]]): reference = even event ids, current = odd;
    * buckets are the exact reference deciles (Spark's interpolation
    * formula, replayed by the oracle over the sorted reference list),
    * per-bucket contributions in integer micro-units so no
    * accumulation-order-sensitive double sum crosses the engines.
    */
  val qPsiDrift = Q("q_psi_drift",
    (s, dir) => {
      val ev = t(s, dir, "events")
      DataQuality.psi(ev.filter(col("event_id") % 2 === 0),
        ev.filter(col("event_id") % 2 === 1), col("value"), nBuckets = 10)
    },
    Some("""WITH r AS (
        SELECT CAST(value AS DOUBLE) AS v FROM events
        WHERE event_id % 2 = 0 AND value IS NOT NULL),
      c AS (
        SELECT CAST(value AS DOUBLE) AS v FROM events
        WHERE event_id % 2 = 1 AND value IS NOT NULL),
      s AS (SELECT list(v ORDER BY v) AS xs, count(*) AS n FROM r),
      m AS (
        SELECT k.k, xs, n, (k.k / 10.0) * (n - 1) AS h,
          CAST(floor((k.k / 10.0) * (n - 1)) AS BIGINT) AS lo,
          ceil((k.k / 10.0) * (n - 1)) AS hi
        FROM s CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS k) k),
      e AS (
        SELECT k, CASE WHEN hi = lo THEN xs[lo + 1]
                       ELSE (hi - h) * xs[lo + 1] + (h - lo) * xs[lo + 2]
                  END AS edge
        FROM m),
      rb AS (SELECT 1 + (SELECT count(*) FROM e WHERE r.v > e.edge)
               AS bucket FROM r),
      cb AS (SELECT 1 + (SELECT count(*) FROM e WHERE c.v > e.edge)
               AS bucket FROM c),
      nr AS (SELECT bucket, count(*) AS n_ref FROM rb GROUP BY 1),
      nc AS (SELECT bucket, count(*) AS n_cur FROM cb GROUP BY 1),
      b AS (SELECT CAST(unnest(generate_series(1, 10)) AS INTEGER)
              AS bucket),
      j AS (
        SELECT b.bucket, coalesce(nr.n_ref, 0) AS n_ref,
               coalesce(nc.n_cur, 0) AS n_cur
        FROM b LEFT JOIN nr ON nr.bucket = b.bucket
               LEFT JOIN nc ON nc.bucket = b.bucket),
      tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
      SELECT j.bucket, CAST(j.n_ref AS BIGINT) AS n_ref,
        CAST(j.n_cur AS BIGINT) AS n_cur,
        CAST(floor((greatest(j.n_cur::DOUBLE / tot.tc, 1e-6)
                    - greatest(j.n_ref::DOUBLE / tot.tr, 1e-6))
          * ln(greatest(j.n_cur::DOUBLE / tot.tc, 1e-6)
               / greatest(j.n_ref::DOUBLE / tot.tr, 1e-6))
          * 1e6 + 0.5) AS BIGINT) AS psi_x1e6
      FROM j CROSS JOIN tot"""))

  /** PSI drift TIME SERIES ([[DataQuality.psiSeries]]): the frozen
    * profile (even event_ids — same reference as q_psi_drift) applied
    * per HOUR of the odd slice — "when did the distribution move", the
    * backfill complement of the streaming tick. The oracle rebuilds
    * the profile (exact-decile edges + reference fractions) and
    * replays the per-period clamp + ln + integer-micro sum from
    * scratch.
    */
  val qPsiDriftSeries = Q("q_psi_drift_series",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val prof = DataQuality.psiProfile(
        ev.filter(col("event_id") % 2 === 0), col("value"), nBuckets = 10)
      DataQuality.psiSeries(prof, ev.filter(col("event_id") % 2 === 1),
        col("value"), date_trunc("hour", col("ts")))
    },
    Some("""WITH r AS (
        SELECT CAST(value AS DOUBLE) AS v FROM events
        WHERE event_id % 2 = 0 AND value IS NOT NULL),
      c AS (
        SELECT date_trunc('hour', ts) AS period, CAST(value AS DOUBLE) AS v
        FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL),
      s AS (SELECT list(v ORDER BY v) AS xs, count(*) AS n FROM r),
      m AS (
        SELECT k.k, xs, n, (k.k / 10.0) * (n - 1) AS h,
          CAST(floor((k.k / 10.0) * (n - 1)) AS BIGINT) AS lo,
          ceil((k.k / 10.0) * (n - 1)) AS hi
        FROM s CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS k) k),
      e AS (
        SELECT k, CASE WHEN hi = lo THEN xs[lo + 1]
                       ELSE (hi - h) * xs[lo + 1] + (h - lo) * xs[lo + 2]
                  END AS edge
        FROM m),
      rb AS (SELECT 1 + (SELECT count(*) FROM e WHERE r.v > e.edge)
               AS bucket FROM r),
      nr AS (SELECT bucket, count(*) AS n_ref FROM rb GROUP BY 1),
      b AS (SELECT CAST(unnest(generate_series(1, 10)) AS INTEGER)
              AS bucket),
      tr AS (SELECT sum(n_ref) AS t FROM nr),
      fr AS (
        SELECT b.bucket,
               greatest(coalesce(nr.n_ref, 0)::DOUBLE / tr.t, 1e-6) AS f
        FROM b LEFT JOIN nr ON nr.bucket = b.bucket CROSS JOIN tr),
      cb AS (SELECT period,
               1 + (SELECT count(*) FROM e WHERE c.v > e.edge) AS bucket
             FROM c),
      pt AS (SELECT period, count(*) AS n_cur FROM cb GROUP BY 1),
      pc AS (SELECT period, bucket, count(*) AS cnt FROM cb GROUP BY 1, 2),
      grid AS (SELECT pt.period, pt.n_cur, b.bucket FROM pt CROSS JOIN b),
      j AS (
        SELECT grid.period, grid.n_cur, grid.bucket,
               coalesce(pc.cnt, 0) AS cnt
        FROM grid LEFT JOIN pc
          ON pc.period = grid.period AND pc.bucket = grid.bucket)
      SELECT j.period, CAST(max(j.n_cur) AS BIGINT) AS n_cur,
        CAST(sum(CAST(floor((greatest(cnt::DOUBLE / n_cur, 1e-6) - fr.f)
            * ln(greatest(cnt::DOUBLE / n_cur, 1e-6) / fr.f)
            * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS psi_x1e6
      FROM j JOIN fr ON fr.bucket = j.bucket
      GROUP BY j.period"""))

  /** CATEGORICAL PSI drift ([[DataQuality.catPsi]]): language-mix
    * drift between two document snapshots — the categorical-space
    * signal a text-pipeline monitor must see first. Buckets are the
    * reference's top-3 languages (count desc, lexicographic asc on
    * ties — deterministic, replayed by the oracle) plus the `__other__`
    * roll-up; same epsilon clamp and integer-micro convention as
    * q_psi_drift.
    */
  val qPsiDriftCat = Q("q_psi_drift_cat",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      DataQuality.catPsi(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), col("lang"), topK = 3)
    },
    Some("""WITH r AS (
        SELECT lang AS c FROM documents
        WHERE doc_id % 2 = 0 AND lang IS NOT NULL),
      cu AS (
        SELECT lang AS c FROM documents
        WHERE doc_id % 2 = 1 AND lang IS NOT NULL),
      top AS (
        SELECT c AS category FROM (
          SELECT c, row_number() OVER (ORDER BY count(*) DESC, c ASC)
            AS rn
          FROM r GROUP BY c) WHERE rn <= 3),
      buckets AS (
        SELECT category FROM top UNION ALL SELECT '__other__'),
      rb AS (
        SELECT CASE WHEN c IN (SELECT category FROM top) THEN c
                    ELSE '__other__' END AS category FROM r),
      cb AS (
        SELECT CASE WHEN c IN (SELECT category FROM top) THEN c
                    ELSE '__other__' END AS category FROM cu),
      nr AS (SELECT category, count(*) AS n_ref FROM rb GROUP BY 1),
      nc AS (SELECT category, count(*) AS n_cur FROM cb GROUP BY 1),
      j AS (
        SELECT b.category, coalesce(nr.n_ref, 0) AS n_ref,
               coalesce(nc.n_cur, 0) AS n_cur
        FROM buckets b LEFT JOIN nr ON nr.category = b.category
               LEFT JOIN nc ON nc.category = b.category),
      tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM j)
      SELECT j.category, CAST(j.n_ref AS BIGINT) AS n_ref,
        CAST(j.n_cur AS BIGINT) AS n_cur,
        CAST(floor((greatest(j.n_cur::DOUBLE / tot.tc, 1e-6)
                    - greatest(j.n_ref::DOUBLE / tot.tr, 1e-6))
          * ln(greatest(j.n_cur::DOUBLE / tot.tc, 1e-6)
               / greatest(j.n_ref::DOUBLE / tot.tr, 1e-6))
          * 1e6 + 0.5) AS BIGINT) AS psi_x1e6
      FROM j CROSS JOIN tot"""))

  /** Categorical PSI drift TIME SERIES ([[DataQuality.catPsiSeries]]):
    * the frozen top-3 event-type profile (even event_ids) applied per
    * DAY of the odd slice — when did the category MIX move; the two
    * below-top-K types exercise a populated OTHER bucket in every
    * period. Oracle rebuilds the top-K profile (count desc, category
    * asc tie-break) and replays the per-period arithmetic.
    */
  val qPsiDriftCatSeries = Q("q_psi_drift_cat_series",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val prof = DataQuality.catPsiProfile(
        ev.filter(col("event_id") % 2 === 0), col("event_type"), topK = 3)
      DataQuality.catPsiSeries(prof, ev.filter(col("event_id") % 2 === 1),
        col("event_type"), date_trunc("day", col("ts")))
    },
    Some("""WITH r AS (
        SELECT event_type AS c FROM events
        WHERE event_id % 2 = 0 AND event_type IS NOT NULL),
      cu AS (
        SELECT date_trunc('day', ts) AS period, event_type AS c
        FROM events WHERE event_id % 2 = 1 AND event_type IS NOT NULL),
      top AS (
        SELECT c AS category FROM (
          SELECT c, row_number() OVER (ORDER BY count(*) DESC, c ASC)
            AS rn
          FROM r GROUP BY c)
        WHERE rn <= 3),
      buckets AS (
        SELECT category FROM top UNION ALL SELECT '__other__'),
      rb AS (
        SELECT CASE WHEN c IN (SELECT category FROM top) THEN c
                    ELSE '__other__' END AS category FROM r),
      nr AS (SELECT category, count(*) AS n_ref FROM rb GROUP BY 1),
      tr AS (SELECT sum(n_ref) AS t FROM nr),
      fr AS (
        SELECT b.category,
               greatest(coalesce(nr.n_ref, 0)::DOUBLE / tr.t, 1e-6) AS f
        FROM buckets b LEFT JOIN nr ON nr.category = b.category
        CROSS JOIN tr),
      cb AS (
        SELECT period,
               CASE WHEN c IN (SELECT category FROM top) THEN c
                    ELSE '__other__' END AS category FROM cu),
      pt AS (SELECT period, count(*) AS n_cur FROM cb GROUP BY 1),
      pc AS (SELECT period, category, count(*) AS cnt
             FROM cb GROUP BY 1, 2),
      grid AS (SELECT pt.period, pt.n_cur, b.category
               FROM pt CROSS JOIN buckets b),
      j AS (
        SELECT grid.period, grid.n_cur, grid.category,
               coalesce(pc.cnt, 0) AS cnt
        FROM grid LEFT JOIN pc
          ON pc.period = grid.period AND pc.category = grid.category)
      SELECT j.period, CAST(max(j.n_cur) AS BIGINT) AS n_cur,
        CAST(sum(CAST(floor((greatest(cnt::DOUBLE / n_cur, 1e-6) - fr.f)
            * ln(greatest(cnt::DOUBLE / n_cur, 1e-6) / fr.f)
            * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS psi_x1e6
      FROM j JOIN fr ON fr.category = j.category
      GROUP BY j.period"""))

  /** KMV distinct sketch: unlike HLL, the k-minimum-values estimator
    * over the portable md5 hash is bit-reproducible in any engine, so
    * the SKETCH ITSELF is oracle-checked — the distributed-sketch
    * correctness proof q_hll can't have. */
  val qKmv = Q("q_kmv_distinct",
    (s, dir) => graft.ext.Sketch.kmvDistinct(t(s, dir, "lineitem"),
      Seq("l_returnflag"), "l_partkey", k = 64),
    Some("""WITH hashed AS (
        SELECT DISTINCT l_returnflag,
          ('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,15))::BIGINT AS h
        FROM lineitem),
      ranked AS (
        SELECT l_returnflag, h,
          row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        FROM hashed),
      agg AS (
        SELECT l_returnflag, max(rn) AS n_seen, max(h) AS h_k
        FROM ranked WHERE rn <= 64 GROUP BY l_returnflag)
      SELECT l_returnflag,
        CAST(CASE WHEN n_seen < 64 THEN n_seen
             ELSE CAST(floor(63.0 * 1152921504606846976.0 / h_k) AS BIGINT)
             END AS BIGINT) AS est_distinct
      FROM agg"""))

  /** HLL sketch distinct counts (approx_count_distinct): DuckDB's
    * approx_distinct uses a different sketch, so the estimate itself has
    * no portable oracle — instead the query is PROPERTY-CHECKED: it
    * computes the exact distinct count alongside (which the oracle CAN
    * replay) and asserts the estimate inside 3× the sketch's configured
    * relative standard deviation (rsd 0.05 → 15%; HLL++ is deterministic
    * for a given dataset — register merges are max, partitioning-
    * independent — so the boolean can't flap). An estimator regression
    * flips the hash. */
  val qHll = Q("q_hll",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("exact_parts"), col("n"),
        (abs(col("approx_parts") - col("exact_parts")).cast("double")
          <= lit(0.15) * col("exact_parts")).as("within_bound")),
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        count(*) AS n, TRUE AS within_bound
      FROM lineitem GROUP BY l_returnflag"""))

  /** Spark's builtin `percentile_approx` (Greenwald-Khanna sketch — the
    * BOUNDED-state alternative to the value-buffering exact aggregate:
    * O(accuracy·log n) buffer instead of the per-group value→count map
    * q_percentiles' rewrite removed) property-checked against its rank
    * contract: the returned value's rank INTERVAL (counted Spark-side)
    * must intersect the n/accuracy band around the target rank. A
    * value with duplicates occupies the whole rank range
    * [count(< v) + 1, count(<= v)]; GK only guarantees SOME rank of
    * the returned value is within n/accuracy of the target, so the
    * check passes iff that interval meets the band — checking only
    * count(<= v) (the MAXIMUM rank) would flakily fail on heavy ties
    * even when the sketch meets its contract. The exact p50 rides
    * along from [[graft.ext.Prefix.groupPercentiles]] so the row also
    * certifies the exact value; the approx value itself is NOT output
    * (GK merge order varies across partitionings — only its bounded
    * error is the contract).
    */
  val qApproxPercentile = Q("q_approx_percentile",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val acc = 100 // rank error <= n/100
      val ap = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(acc))
          .as("ap50"), count(lit(1)).as("n"))
      val ranked = li.join(broadcast(ap), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("ap50"), col("n"))
        .agg(count(when(col("l_extendedprice") <= col("ap50"), 1))
          .as("rank_le"),
          count(when(col("l_extendedprice") < col("ap50"), 1))
            .as("rank_lt"))
      val exact = graft.ext.Prefix.groupPercentiles(li, Seq("l_returnflag"),
        col("l_extendedprice"),
        tiebreak = Seq(col("l_orderkey"), col("l_linenumber")),
        ps = Seq(0.5 -> "ex50"))
      // the value's rank interval is [rank_lt + 1, rank_le]; pass iff
      // it intersects [n/2 - n/acc, n/2 + n/acc] (+1 slop preserved
      // from the single-rank form)
      val err = col("n").cast("double") / acc + 1
      ranked.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n"),
          (floor(col("ex50") * 100 + 0.5) / 100).as("p50"),
          (col("rank_lt").cast("double") + 1 <= col("n") * 0.5 + err &&
            col("rank_le").cast("double") >= col("n") * 0.5 - err)
            .as("within_bound"))
    },
    Some("""WITH s AS (
        SELECT l_returnflag,
          list(l_extendedprice ORDER BY l_extendedprice) AS xs,
          count(*) AS n
        FROM lineitem GROUP BY 1),
      m AS (
        SELECT l_returnflag, xs, n, 0.5::DOUBLE * (n - 1) AS h,
          CAST(floor(0.5::DOUBLE * (n - 1)) AS BIGINT) AS lo,
          ceil(0.5::DOUBLE * (n - 1)) AS hi
        FROM s)
      SELECT l_returnflag, n,
        floor((CASE WHEN hi = lo THEN xs[lo + 1]
                    ELSE (hi - h) * xs[lo + 1] + (h - lo) * xs[lo + 2]
               END) * 100 + 0.5) / 100 AS p50,
        TRUE AS within_bound
      FROM m"""))

  /** Count-Min-sketch frequency estimates for the corpus's top-20 tokens,
    * reported against the exact counts. The grid ([[graft.ext.Sketch
    * .cmsCells]]) uses the portable md5 hash, so DuckDB rebuilds the
    * identical cells and min-reads — the estimate itself is
    * oracle-checked, not just bounded. Two tokenize passes (grid build +
    * exact probe counts), the same audited trade as q_heavy_hitters:
    * re-running the codegen'd tokenizer is cheaper and
    * smaller-footprint than caching the exploded postings. */
  val qCmsFreq = Q("q_cms_freq",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(TextOps.tokens(TextOps.normalized(col("text"))))
          .as("token"))
      val probes = toks.groupBy(col("token"))
        .agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("token").asc)
        .limit(20)
      graft.ext.Sketch.cmsEstimate(toks, "token", probes, "token",
        depth = 4, width = 512)
    },
    Some("""WITH tok AS (
        SELECT unnest(string_split(
          trim(regexp_replace(lower(text),'\s+',' ','g')), ' ')) AS t
        FROM documents),
      cells AS (
        SELECT d.d,
          ('0x'||substr(md5(t || '#' || d.d),1,15))::BIGINT % 512 AS bucket,
          count(*) AS c
        FROM tok CROSS JOIN (SELECT unnest(generate_series(0,3)) AS d) d
        GROUP BY 1, 2),
      exact AS (
        SELECT t AS token, count(*) AS exact_n FROM tok GROUP BY 1
        ORDER BY exact_n DESC, token ASC LIMIT 20)
      SELECT e.token, e.exact_n, min(c.c) AS cms_n
      FROM exact e
      CROSS JOIN (SELECT unnest(generate_series(0,3)) AS d) d
      JOIN cells c ON c.d = d.d
        AND c.bucket = ('0x'||substr(md5(e.token || '#' || d.d),1,15))::BIGINT % 512
      GROUP BY 1, 2"""))

  // ---------------------------------------------------------------------
  // Extension: multimodal column plumbing (decode stubbed — no codecs in
  // this environment; schema/batching/partitioning are real).
  // ---------------------------------------------------------------------

  val qMultimodal = Q("multimodal_meta",
    (s, dir) => {
      val media = Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text", "text/plain")
      media.select(
        col("media_id"),
        col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.checksum").as("checksum"),
        Multimodal.fakeDecodeMeta(col("content")).as("dec"))
        .select(col("media_id"), col("n_bytes"), col("checksum"),
          col("dec.width").as("width"), col("dec.height").as("height"),
          col("dec.n_frames").as("n_frames"))
    },
    Some("""SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
      md5(text) AS checksum,
      64 + octet_length(encode(text)) % 512 AS width,
      64 + (octet_length(encode(text)) * 7) % 512 AS height,
      1 + octet_length(encode(text)) % 16 AS n_frames
      FROM documents"""))

  /** Frame sampling over media columns: every 2nd frame of each media
    * row (frame count from the decode stub), one row per sampled frame
    * with a content-derived fingerprint. */
  val qMultimodalFrames = Q("multimodal_frames",
    (s, dir) => Multimodal.sampleFrames(
      Multimodal.asMedia(t(s, dir, "documents"), "doc_id", "text", "text/plain"),
      step = 2),
    Some("""SELECT media_id, n_frames, frame_no,
        md5(checksum||':'||frame_no) AS frame_fp
      FROM (SELECT doc_id AS media_id, md5(text) AS checksum,
              1 + octet_length(encode(text)) % 16 AS n_frames
            FROM documents),
      LATERAL (SELECT unnest(generate_series(1, n_frames, 2)) AS frame_no)"""))

  /** Content-addressed frame-store dedup — the multimodal × dedup
    * composition: media (built on a coarse 12-char clip key so real
    * duplicates exist) explode to frames, and identical frames across
    * media collapse to one stored copy + a refcount — the storage-dedup
    * step of a video corpus. Frame fingerprints are md5-derived
    * (decode stub), so the whole pipeline replays in the oracle.
    */
  val qFrameDedup = Q("multimodal_frame_dedup",
    (s, dir) => {
      val media = Multimodal.asMedia(
        t(s, dir, "documents").select(col("doc_id"),
          substring(TextOps.normalized(col("text")), 1, 12).as("clip")),
        "doc_id", "clip", "video/fake")
      Multimodal.sampleFrames(media, step = 1)
        .groupBy(col("frame_fp"))
        .agg(min(col("media_id")).as("keep_media"),
          count(lit(1)).as("n_copies"))
    },
    Some("""WITH media AS (
        SELECT doc_id AS media_id,
          substr(trim(regexp_replace(lower(text),'\s+',' ','g')), 1, 12) AS clip
        FROM documents),
      m2 AS (
        SELECT media_id, md5(clip) AS checksum,
          1 + octet_length(encode(clip)) % 16 AS n_frames
        FROM media),
      frames AS (
        SELECT media_id, md5(checksum||':'||f.frame_no) AS frame_fp
        FROM m2, LATERAL (
          SELECT unnest(generate_series(1, n_frames, 1)) AS frame_no) f)
      SELECT frame_fp, min(media_id) AS keep_media, count(*) AS n_copies
      FROM frames GROUP BY frame_fp"""))

  /** Z-order curve value ([[ZOrder.zValue]]): the multi-dimensional
    * clustering key behind `OPTIMIZE ... ZORDER BY`-style layouts —
    * grid cells by offset-and-shift, bit interleave by the standard
    * mask-doubling rounds, all integer builtins. Bounds are FIXED
    * documented constants (user grid 2^12 up-shifted 4, a 2^32 ms
    * window from 2024-01-01 down-shifted 16) so the oracle replays the
    * identical shifts at any SF; clamping makes out-of-range rows safe.
    */
  val qZorderValue = Q("q_zorder_value",
    (s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
      ev.select(col("event_id"),
        ZOrder.zValue(col("user_id"), 0L, 4095L,
          col("ts_ms"), 1704067200000L, 1704067200000L + 4294967295L)
          .as("zv"))
    },
    Some("""WITH e AS (
        SELECT event_id,
          (least(greatest(user_id, 0), 4095) << 4) AS x,
          (least(greatest(epoch_ms(ts) - 1704067200000, 0), 4294967295) >> 16) AS y
        FROM events),
      s1 AS (SELECT event_id, ((x | (x << 8)) & 16711935) AS x,
                    ((y | (y << 8)) & 16711935) AS y FROM e),
      s2 AS (SELECT event_id, ((x | (x << 4)) & 252645135) AS x,
                    ((y | (y << 4)) & 252645135) AS y FROM s1),
      s3 AS (SELECT event_id, ((x | (x << 2)) & 858993459) AS x,
                    ((y | (y << 2)) & 858993459) AS y FROM s2),
      s4 AS (SELECT event_id, ((x | (x << 1)) & 1431655765) AS x,
                    ((y | (y << 1)) & 1431655765) AS y FROM s3)
      SELECT event_id, (x | (y << 1)) AS zv FROM s4"""))

  /** File-skipping certificate ([[ZOrder.zorderWrite]] +
    * [[ZOrder.prunedRead]]): cluster events on the (user_id, ts) curve
    * with a per-file min/max manifest, answer a 2-D box query reading
    * ONLY intersecting files, and prove row-for-row equality with the
    * oracle's full-scan filter — file skipping must lose nothing. The
    * files-kept-vs-total structural claim is the ZOrderSpec
    * certificate; this row pins the correctness half at the gate.
    */
  val qZorderPrune = Q("q_zorder_prune",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_zorder_q").toString + "/layout"
      ZOrder.zorderWrite(ev, tmp, "user_id", "ts_ms", nFiles = 16)
      ZOrder.prunedRead(s, tmp, 10L, 30L, 1704500000000L, 1705500000000L)
    },
    Some("""SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
        WHERE user_id BETWEEN 10 AND 30
          AND epoch_ms(ts) BETWEEN 1704500000000 AND 1705500000000"""))

}
