package graft

import org.apache.spark.sql.functions._

import graft.ext.{Corpus, Dedup, Splits}

/** Train/eval splits, training-shard export, and the release diff card
  * — the corpus → training-run boundary operators ([[graft.ext.Splits]]
  * + [[Corpus.corpusDiff]]).
  *
  * One mixin slice of [[Queries]], same conventions as the rest: every
  * computed column aliased identically in Spark and SQL, integer
  * arithmetic wherever a float could round differently across engines.
  */
private[graft] trait QueriesSplits { this: Queries.type =>

  /** The shared 80/10/10 ppm weights every split query uses. */
  private val splitWeights =
    Seq("train" -> 800000, "val" -> 100000, "test" -> 100000)

  /** DuckDB replay of [[graft.ext.Splits]]' ppm `when`-chain over the
    * portable hash of `key` (a SQL expression).
    */
  private def splitCaseSql(key: String): String =
    s"""CASE WHEN ('0x'||substr(md5($key),1,15))::BIGINT % 1000000 < 800000
          THEN 'train'
        WHEN ('0x'||substr(md5($key),1,15))::BIGINT % 1000000 < 900000
          THEN 'val'
        ELSE 'test' END"""

  /** Deterministic hash split: the stateless 80/10/10 assignment every
    * doc keeps across corpus versions (membership is a pure function of
    * the id — growing the corpus never moves a document over the
    * train/eval boundary). The full per-doc map is pinned, not just
    * counts.
    */
  val qSplitAssign = Q("q_split_assign",
    (s, dir) => Splits.hashSplit(t(s, dir, "documents"), Seq("doc_id"),
        splitWeights)
      .select(col("doc_id"), col("split")),
    Some(s"""SELECT doc_id, ${splitCaseSql("doc_id::VARCHAR")} AS split
      FROM documents"""))

  /** Exact-proportion split, stratified by language: within each lang,
    * rows ranked by the portable hash take split boundaries at
    * floor(n·cum/1e6) — realized counts exact, not binomial. The
    * oracle replays the rank (row_number over (hash, id)) and the
    * integer threshold arithmetic from scratch.
    */
  val qSplitExact = Q("q_split_exact",
    (s, dir) => Splits.exactSplit(t(s, dir, "documents"), Seq("doc_id"),
        splitWeights, strata = Seq("lang"))
      .select(col("doc_id"), col("split")),
    Some("""WITH h AS (
        SELECT doc_id, lang,
               ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT AS hv
        FROM documents),
      r AS (
        SELECT doc_id,
               row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS r,
               count(*) OVER (PARTITION BY lang) AS n
        FROM h)
      SELECT doc_id,
        CASE WHEN r <= (n * 800000) // 1000000 THEN 'train'
             WHEN r <= (n * 900000) // 1000000 THEN 'val'
             ELSE 'test' END AS split
      FROM r"""))

  /** Exact k-fold CV assignment ([[Splits.kFold]]): ntile(5) over the
    * hash order per language — fold sizes within one row, oracle
    * replays with DuckDB's native ntile (boundary semantics must agree
    * exactly for the full per-doc map to hash-match).
    */
  val qKfold = Q("q_kfold",
    (s, dir) => Splits.kFold(t(s, dir, "documents"), Seq("doc_id"),
        k = 5, strata = Seq("lang"))
      .select(col("doc_id"), col("fold")),
    Some("""WITH h AS (
        SELECT doc_id, lang,
               ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT AS hv
        FROM documents)
      SELECT doc_id,
        CAST(ntile(5) OVER (PARTITION BY lang ORDER BY hv, doc_id)
             AS INTEGER) AS fold
      FROM h"""))

  /** Grouped k-fold ([[Splits.groupKFold]]): whole groups per fold —
    * the grouped-CV assignment. The oracle replays fold assignment
    * over the DISTINCT groups (hash order + ntile) and joins back,
    * pinning both the group-atomicity and the balance.
    */
  val qGroupKfold = Q("q_group_kfold",
    (s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("grp", expr("doc_id div 7L"))
      Splits.groupKFold(d, "grp", k = 4)
        .select(col("doc_id"), col("grp"), col("fold"))
    },
    Some("""WITH d AS (SELECT doc_id, doc_id // 7 AS grp FROM documents),
      g AS (SELECT DISTINCT grp FROM d),
      h AS (SELECT grp,
          ('0x'||substr(md5(grp::VARCHAR),1,15))::BIGINT AS hv FROM g),
      f AS (SELECT grp,
          CAST(ntile(4) OVER (ORDER BY hv, grp) AS INTEGER) AS fold
        FROM h)
      SELECT d.doc_id, d.grp, f.fold FROM d JOIN f ON d.grp = f.grp"""))

  /** Leakage-free split: near-dup clusters (Jaccard pairs → connected
    * components; singletons are their own cluster) assigned atomically
    * by the hash of the CLUSTER id. The oracle rebuilds components via
    * recursive-CTE reachability and replays the cluster-keyed ppm
    * chain — pinning both the component structure and the assignment.
    */
  val qSplitCluster = Q("q_split_cluster",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val pairs = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, tau = 0.25)
      Splits.clusterSplit(d, pairs, "doc_id", splitWeights)
        .select(col("doc_id"), col("cluster_id"), col("split"))
    },
    Some(s"""$clusterReachCte,
      cl AS (SELECT id, min(r) AS c FROM reach GROUP BY id)
      SELECT d.doc_id, coalesce(cl.c, d.doc_id) AS cluster_id,
        ${splitCaseSql("coalesce(cl.c, d.doc_id)::VARCHAR")} AS split
      FROM documents d LEFT JOIN cl ON cl.id = d.doc_id"""))

  /** The leakage certificate: near-dup pairs straddling the train/eval
    * boundary, for the naive hash split vs the cluster split over the
    * SAME pair relation. The cluster row is 0 BY CONSTRUCTION — the
    * hash pins that the guarantee actually holds on real data, and
    * pins the naive split's nonzero leakage count next to it.
    */
  val qSplitLeakage = Q("q_split_leakage",
    (s, dir) => {
      val d = t(s, dir, "documents")
      // the pair relation feeds the component build AND four
      // certificate joins — one materialization, five scans
      val pairs = graft.ext.Materialize.multiScan(
        Dedup.jaccardPairs(d, "doc_id", "text", n = 3, tau = 0.25)
          .select(col("id_a"), col("id_b")))
      val naive = Splits.hashSplit(d, Seq("doc_id"), splitWeights)
        .select(col("doc_id"), col("split"))
      val clustered = Splits.clusterSplit(d, pairs, "doc_id", splitWeights)
        .select(col("doc_id"), col("split"))
      def leak(assign: org.apache.spark.sql.DataFrame, method: String) =
        Splits.crossSplitPairs(pairs, assign, "doc_id", "split")
          .agg(count(lit(1)).as("cross_pairs"))
          .select(lit(method).as("method"), col("cross_pairs"))
      leak(naive, "hash_split").unionAll(leak(clustered, "cluster_split"))
    },
    Some(s"""$clusterReachCte,
      cl AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
      na AS (SELECT doc_id, ${splitCaseSql("doc_id::VARCHAR")} AS s
             FROM documents),
      ca AS (SELECT d.doc_id,
               ${splitCaseSql("coalesce(cl.c, d.doc_id)::VARCHAR")} AS s
             FROM documents d LEFT JOIN cl ON cl.id = d.doc_id)
      SELECT 'hash_split' AS method, count(*) AS cross_pairs
      FROM pairs p JOIN na x ON x.doc_id = p.id_a
                   JOIN na y ON y.doc_id = p.id_b
      WHERE x.s <> y.s
      UNION ALL
      SELECT 'cluster_split', count(*)
      FROM pairs p JOIN ca x ON x.doc_id = p.id_a
                   JOIN ca y ON y.doc_id = p.id_b
      WHERE x.s <> y.s"""))

  /** Deterministic global shuffle + fixed-size shard assignment: the
    * full (doc → shard, pos) permutation pinned — rank order by
    * (hash, id), shard = rank div 64, pos = rank mod 64. A rank or
    * boundary regression anywhere moves rows and flips the hash.
    */
  val qShardExport = Q("q_shard_export",
    (s, dir) => Splits.shardExport(t(s, dir, "documents"), Seq("doc_id"),
        shardSize = 64L)
      .select(col("doc_id"), col("shard"), col("pos")),
    Some("""WITH h AS (
        SELECT doc_id,
               ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT AS hv
        FROM documents),
      r AS (SELECT doc_id,
              row_number() OVER (ORDER BY hv, doc_id) AS rn FROM h)
      SELECT doc_id, (rn - 1) // 64 AS shard, (rn - 1) % 64 AS pos
      FROM r"""))

  /** Release-to-release diff card ([[Corpus.corpusDiff]]): two
    * deterministic snapshot projections of the fixture (old drops
    * id % 10 = 0 — those become ADDED; new drops id % 9 = 0 — those
    * become REMOVED; id % 7 = 0 gets a ' v2' suffix in new — CHANGED
    * where surviving) diffed per source on md5 content fingerprints
    * with the net UTF-8 byte delta. Both engines build both snapshots
    * from scratch.
    */
  val qCorpusDiff = Q("q_corpus_diff",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val oldSnap = d.filter(col("doc_id") % 10 =!= 0)
      val newSnap = d.filter(col("doc_id") % 9 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      Corpus.corpusDiff(oldSnap, newSnap, "doc_id", "text")
    },
    Some("""WITH o AS (
        SELECT doc_id, source, md5(text) AS fp, strlen(text) AS b
        FROM documents WHERE doc_id % 10 <> 0),
      n AS (
        SELECT doc_id, source, md5(t) AS fp, strlen(t) AS b FROM (
          SELECT doc_id, source,
            CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS t
          FROM documents WHERE doc_id % 9 <> 0)),
      j AS (
        SELECT coalesce(n.source, o.source) AS source,
          CASE WHEN o.doc_id IS NULL THEN 'added'
               WHEN n.doc_id IS NULL THEN 'removed'
               WHEN n.fp IS DISTINCT FROM o.fp THEN 'changed'
               ELSE 'unchanged' END AS st,
          coalesce(n.b, 0) - coalesce(o.b, 0) AS db
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
      SELECT source,
        count(*) FILTER (WHERE st = 'added') AS n_added,
        count(*) FILTER (WHERE st = 'removed') AS n_removed,
        count(*) FILTER (WHERE st = 'changed') AS n_changed,
        count(*) FILTER (WHERE st = 'unchanged') AS n_unchanged,
        CAST(sum(db) AS BIGINT) AS bytes_delta
      FROM j GROUP BY source"""))

  /** Data-mixing plan ([[Corpus.mixingPlan]]): per-source target
    * tokens and epochs for a 25/25/40/10 mix over a 10,000,123-unit
    * budget (the odd budget exercises the overflow-free
    * div/mod-composed integer arithmetic; the fourth target names a
    * source absent from the corpus, pinning the NULL-avail alert
    * path). Unit here is n_chars — the operator is generic over the
    * token column.
    */
  val qMixingPlan = Q("q_mixing_plan",
    (s, dir) => Corpus.mixingPlan(t(s, dir, "documents"),
      "source", "n_chars",
      Seq("src1" -> 250000, "src2" -> 250000, "src3" -> 400000,
        "src_missing" -> 100000),
      budget = 10000123L),
    Some("""WITH avail AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail_tokens
        FROM documents GROUP BY source),
      t(source, target_ppm) AS (VALUES
        ('src1', 250000), ('src2', 250000), ('src3', 400000),
        ('src_missing', 100000))
      SELECT t.source, t.target_ppm, a.avail_tokens,
        10::BIGINT * target_ppm
          + (123::BIGINT * target_ppm) // 1000000 AS target_tokens,
        CASE WHEN a.avail_tokens > 0 THEN
          floor((10::BIGINT * target_ppm
                 + (123::BIGINT * target_ppm) // 1000000)::DOUBLE
                / a.avail_tokens * 10000 + 0.5) / 10000
        END AS epochs
      FROM t LEFT JOIN avail a USING (source)"""))

  /** Mixing-plan EXECUTION ([[Corpus.expandEpochs]]): 2.5 epochs of
    * src1 (every doc twice + a hash-chosen half once more), 0.5 of
    * src2 (deterministic subsample), exactly 1.0 of src3, everything
    * else out of the mix. The full (doc, copy) multiset is pinned —
    * replication counts, fractional admission, and the salted hash all
    * replayed in SQL.
    */
  val qEpochExpand = Q("q_epoch_expand",
    (s, dir) => Corpus.expandEpochs(t(s, dir, "documents"), "source",
        Seq("doc_id"),
        Seq("src1" -> 2500000L, "src2" -> 500000L, "src3" -> 1000000L))
      .select(col("doc_id"), col("epoch_copy")),
    Some("""WITH t(source, ppm) AS (VALUES
        ('src1', 2500000), ('src2', 500000), ('src3', 1000000)),
      d AS (
        SELECT doc_id,
          ppm::BIGINT // 1000000
            + CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR || ':ep'),1,15))::BIGINT
                     % 1000000 < ppm % 1000000
                   THEN 1 ELSE 0 END AS n
        FROM documents dd JOIN t ON t.source = dd.source)
      SELECT doc_id,
        unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS epoch_copy
      FROM d WHERE n > 0"""))

  /** The corpus→training-artifact capstone COMPOSITE: execute the mix
    * ([[Corpus.expandEpochs]] — replication + fractional admission)
    * then globally shuffle and shard the EXPANDED stream
    * ([[Splits.shardExport]] keyed on (doc, copy) so repeats of a doc
    * scatter across shards rather than clumping). One hash pins the
    * whole path: rates → copy multiset → permutation → shard/pos.
    */
  val qTrainingExport = Q("q_training_export",
    (s, dir) => Splits.shardExport(
        Corpus.expandEpochs(t(s, dir, "documents"), "source",
          Seq("doc_id"),
          Seq("src1" -> 2500000L, "src2" -> 500000L, "src3" -> 1000000L)),
        Seq("doc_id", "epoch_copy"), shardSize = 64L)
      .select(col("doc_id"), col("epoch_copy"), col("shard"), col("pos")),
    Some("""WITH t(source, ppm) AS (VALUES
        ('src1', 2500000), ('src2', 500000), ('src3', 1000000)),
      d AS (
        SELECT doc_id,
          ppm::BIGINT // 1000000
            + CASE WHEN ('0x'||substr(md5(doc_id::VARCHAR || ':ep'),1,15))::BIGINT
                     % 1000000 < ppm % 1000000
                   THEN 1 ELSE 0 END AS n
        FROM documents dd JOIN t ON t.source = dd.source),
      ex AS (
        SELECT doc_id,
          unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS epoch_copy
        FROM d WHERE n > 0),
      r AS (
        SELECT doc_id, epoch_copy, row_number() OVER (ORDER BY
            ('0x'||substr(md5(doc_id::VARCHAR || ':' || epoch_copy::VARCHAR),1,15))::BIGINT,
            doc_id, epoch_copy) AS rn
        FROM ex)
      SELECT doc_id, epoch_copy,
        (rn - 1) // 64 AS shard, (rn - 1) % 64 AS pos
      FROM r"""))

  /** Release-addition novelty ([[Corpus.diffNovelty]]): of the docs the
    * new snapshot ADDED (ids absent from old: id % 10 = 0 surviving
    * the new snapshot's % 9 cut), how many are near-dups
    * (Jaccard ≥ 0.25, n = 3) of ANY old-corpus doc vs genuinely novel,
    * per source. The oracle replays the anti-join slice, the full
    * inverted-index near-dup relation, and the floor-4dp share.
    */
  val qCorpusDiffNovelty = Q("q_corpus_diff_novelty",
    (s, dir) => {
      val d = t(s, dir, "documents")
      Corpus.diffNovelty(
        d.filter(col("doc_id") % 10 =!= 0),
        d.filter(col("doc_id") % 9 =!= 0),
        "doc_id", "text")
    },
    Some("""WITH docs AS (
        SELECT doc_id,
               string_split(trim(regexp_replace(lower(text),'\s+',' ','g')), ' ') AS w
        FROM documents),
      sh AS (
        SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(w)-2, 0)),
          i -> array_to_string(w[i:i+2], ' '))) AS sset
        FROM docs),
      ex AS (SELECT doc_id, len(sset) AS m, unnest(sset) AS shingle FROM sh),
      nd AS (
        SELECT DISTINCT a.doc_id FROM (
          SELECT a.doc_id
          FROM ex a JOIN ex b ON a.shingle = b.shingle
            AND a.doc_id % 10 = 0 AND a.doc_id % 9 <> 0
            AND b.doc_id % 10 <> 0
          GROUP BY a.doc_id, b.doc_id, a.m, b.m
          HAVING round(count(*)::DOUBLE / (a.m + b.m - count(*)), 4)
            >= 0.25) a),
      ad AS (
        SELECT doc_id, source FROM documents
        WHERE doc_id % 10 = 0 AND doc_id % 9 <> 0)
      SELECT source, count(*) AS n_added,
        count(*) FILTER (WHERE ad.doc_id IN (SELECT doc_id FROM nd))
          AS n_added_neardup,
        count(*) - count(*) FILTER (
          WHERE ad.doc_id IN (SELECT doc_id FROM nd)) AS n_added_novel,
        floor((count(*) - count(*) FILTER (
            WHERE ad.doc_id IN (SELECT doc_id FROM nd)))::DOUBLE
          / count(*) * 10000 + 0.5) / 10000 AS novel_share
      FROM ad GROUP BY source"""))

  /** RELEASE CAPSTONE composite — the publishable "cut a release" path
    * the separate release-tooling oracle rows exercise one at a time,
    * composed the way a data team actually ships: over the new
    * snapshot (the `q_corpus_diff` fixture: doc_id % 9 survivors with
    * the % 7 ' v2' mutation), produce in ONE pinned relation
    *
    *  - `card`      per source: doc/char/token counts,
    *  - `digest`    per source: the O(1) XOR content-set digest
    *                ([[Corpus.corpusDigest]]) + distinct/doc counts,
    *  - `diff`      per source vs the prior snapshot (% 10 survivors):
    *                added/removed/changed ([[Corpus.corpusDiff]]),
    *  - `split`     per split: leakage-free cluster-split sizes +
    *                cluster counts ([[Splits.clusterSplit]] over the
    *                snapshot's own near-dup pairs),
    *  - `leakage`   the certificate: cross-split near-dup pairs for
    *                the naive hash split (nonzero) vs the cluster
    *                split (0 BY CONSTRUCTION),
    *  - `shards`    the train slice sharded for export
    *                ([[Splits.shardExport]]): shard count, rows, last
    *                fill.
    *
    * Long format (section, k, v1, v2, v3) so one hash pins the whole
    * composition. The snapshot and its pair relation are each
    * materialized ONCE and read by every section (PlanSpec guards the
    * reuse); the oracle replays all six sections from scratch,
    * including recursive-CTE connected components.
    */
  val qRelease = Q("q_release",
    (s, dir) => {
      val d = t(s, dir, "documents")
      val rel = graft.ext.Materialize.multiScan(
        d.filter(col("doc_id") % 9 =!= 0)
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text"))))
      val prior = d.filter(col("doc_id") % 10 =!= 0)
      val pairs = graft.ext.Materialize.multiScan(
        Dedup.jaccardPairs(rel, "doc_id", "text", n = 3, tau = 0.25)
          .select(col("id_a"), col("id_b")))
      val assign = graft.ext.Materialize.multiScan(
        Splits.clusterSplit(rel, pairs, "doc_id", splitWeights))
      def sec(n: String) = lit(n).as("section")
      val card = rel.groupBy(col("source"))
        .agg(count(lit(1)).as("v1"),
          sum(length(col("text"))).cast("long").as("v2"),
          sum(graft.ext.TextOps.nTokens(col("text"))).cast("long").as("v3"))
        .select(sec("card"), col("source").as("k"),
          col("v1"), col("v2"), col("v3"))
      val digest = Corpus.corpusDigest(rel, "text", "source")
        .select(sec("digest"), col("source").as("k"),
          col("digest60").as("v1"), col("n_distinct").as("v2"),
          col("n_docs").as("v3"))
      val diff = Corpus.corpusDiff(prior, rel, "doc_id", "text")
        .select(sec("diff"), col("source").as("k"),
          col("n_added").as("v1"), col("n_removed").as("v2"),
          col("n_changed").as("v3"))
      val splitRows = assign.groupBy(col("split"))
        .agg(count(lit(1)).as("v1"),
          countDistinct(col("cluster_id")).as("v2"))
        .select(sec("split"), col("split").as("k"), col("v1"), col("v2"),
          lit(0L).as("v3"))
      def leak(a: org.apache.spark.sql.DataFrame, m: String) =
        Splits.crossSplitPairs(pairs, a, "doc_id", "split")
          .agg(count(lit(1)).as("v1"))
          .select(sec("leakage"), lit(m).as("k"), col("v1"),
            lit(0L).as("v2"), lit(0L).as("v3"))
      val naive = Splits.hashSplit(rel, Seq("doc_id"), splitWeights)
        .select(col("doc_id"), col("split"))
      val shards = Splits.shardExport(
          assign.filter(col("split") === "train").select(col("doc_id")),
          Seq("doc_id"), shardSize = 64L)
        .agg(max(col("shard")).as("ms"), count(lit(1)).as("n"))
        .select(sec("shards"), lit("train").as("k"),
          (col("ms") + 1).as("v1"), col("n").as("v2"),
          (col("n") - col("ms") * 64).as("v3"))
      card.unionByName(digest).unionByName(diff).unionByName(splitRows)
        .unionByName(leak(naive, "hash_split"))
        .unionByName(
          leak(assign.select(col("doc_id"), col("split")), "cluster_split"))
        .unionByName(shards)
    },
    Some(s"""WITH RECURSIVE rel AS (
        SELECT doc_id, source,
          CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        FROM documents WHERE doc_id % 9 <> 0),
      docs AS (SELECT doc_id,
          string_split(trim(regexp_replace(lower(text),'\\s+',' ','g')), ' ') AS w
        FROM rel),
      sh AS (SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(w)-2, 0)),
          i -> array_to_string(w[i:i+2], ' '))) AS sset FROM docs),
      ex AS (SELECT doc_id, len(sset) AS m, unnest(sset) AS shingle FROM sh),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id, a.m, b.m
        HAVING round(count(*)::DOUBLE / (a.m + b.m - count(*)), 4) >= 0.25),
      edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                UNION SELECT id_b, id_a FROM pairs),
      reach(id, r) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
      cl AS (SELECT id, min(r) AS c FROM reach GROUP BY id),
      asg AS (SELECT rel.doc_id, coalesce(cl.c, rel.doc_id) AS cluster_id,
          ${splitCaseSql("coalesce(cl.c, rel.doc_id)::VARCHAR")} AS split
        FROM rel LEFT JOIN cl ON cl.id = rel.doc_id),
      na AS (SELECT doc_id, ${splitCaseSql("doc_id::VARCHAR")} AS split
        FROM rel),
      prior AS (SELECT doc_id, source, text FROM documents
        WHERE doc_id % 10 <> 0),
      dgf AS (SELECT source,
          md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
        FROM rel),
      dgg AS (SELECT source, fp, count(*) AS n FROM dgf GROUP BY 1, 2),
      dfo AS (SELECT doc_id, source, md5(text) AS fp FROM prior),
      dfn AS (SELECT doc_id, source, md5(text) AS fp FROM rel),
      dfj AS (SELECT coalesce(n.source, o.source) AS source,
          CASE WHEN o.doc_id IS NULL THEN 'added'
               WHEN n.doc_id IS NULL THEN 'removed'
               WHEN n.fp IS DISTINCT FROM o.fp THEN 'changed'
               ELSE 'unchanged' END AS st
        FROM dfo o FULL OUTER JOIN dfn n ON o.doc_id = n.doc_id),
      tr AS (SELECT doc_id FROM asg WHERE split = 'train'),
      trr AS (SELECT doc_id, row_number() OVER (ORDER BY
            ('0x'||substr(md5(doc_id::VARCHAR),1,15))::BIGINT, doc_id) AS rn
        FROM tr)
      SELECT 'card' AS section, source AS k, count(*) AS v1,
        CAST(sum(length(text)) AS BIGINT) AS v2,
        CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS v3
      FROM rel GROUP BY source
      UNION ALL
      SELECT 'digest', source,
        bit_xor(('0x'||substr(md5(fp),1,15))::BIGINT),
        count(*), CAST(sum(n) AS BIGINT)
      FROM dgg GROUP BY source
      UNION ALL
      SELECT 'diff', source,
        count(*) FILTER (WHERE st = 'added'),
        count(*) FILTER (WHERE st = 'removed'),
        count(*) FILTER (WHERE st = 'changed')
      FROM dfj GROUP BY source
      UNION ALL
      SELECT 'split', split, count(*), count(DISTINCT cluster_id),
        CAST(0 AS BIGINT)
      FROM asg GROUP BY split
      UNION ALL
      SELECT 'leakage', 'hash_split', count(*), CAST(0 AS BIGINT),
        CAST(0 AS BIGINT)
      FROM pairs p JOIN na x ON x.doc_id = p.id_a
                   JOIN na y ON y.doc_id = p.id_b
      WHERE x.split <> y.split
      UNION ALL
      SELECT 'leakage', 'cluster_split', count(*), CAST(0 AS BIGINT),
        CAST(0 AS BIGINT)
      FROM pairs p JOIN asg x ON x.doc_id = p.id_a
                   JOIN asg y ON y.doc_id = p.id_b
      WHERE x.split <> y.split
      UNION ALL
      SELECT 'shards', 'train', max((rn - 1) // 64) + 1, count(*),
        count(*) - max((rn - 1) // 64) * 64
      FROM trr"""))

  /** Curriculum shard export ([[graft.ext.Splits.curriculumExport]]):
    * the hash permutation replaced by an explicit difficulty order —
    * short-to-long here (length is the classic curriculum-learning
    * proxy), doc_id tiebreak. Shard 0 = the 64 easiest docs; the full
    * (shard, pos) assignment is pinned, not just the boundary
    * arithmetic.
    */
  val qCurriculumExport = Q("q_curriculum_export",
    (s, dir) => graft.ext.Splits.curriculumExport(
      t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
      orderCols = Seq(col("n_chars")), keyCols = Seq("doc_id"),
      shardSize = 64),
    Some("""SELECT doc_id, n_chars,
        (row_number() OVER (ORDER BY n_chars, doc_id) - 1) // 64 AS shard,
        (row_number() OVER (ORDER BY n_chars, doc_id) - 1) % 64 AS pos
      FROM documents"""))
}
