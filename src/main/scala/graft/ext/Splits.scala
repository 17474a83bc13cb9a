package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train/validation/test splits and training-shard export — the step
  * between a curated corpus and a training run.
  *
  * Everything here is DETERMINISTIC and seed-free: assignment depends
  * only on row content (via the portable md5 hash family the sampling
  * operators use), never on partitioning, execution order, or a driver
  * RNG — so a split computed on the 1000-executor cluster is
  * byte-identical to one computed on a laptop, and re-running a job
  * cannot silently reshuffle which documents the eval set contains.
  *
  * The reference system (Moonlight-CL/cdc-redshift) stops at loading
  * warehouse tables; splitting/sharding is part of the mandated
  * LLM-pipeline extension surface, not reference parity.
  *
  * Three split strengths, increasing cost:
  *
  *  - [[hashSplit]]: stateless scan projection, proportions hold in
  *    EXPECTATION (binomial around each weight). Zero shuffles — the
  *    100 TB default.
  *  - [[exactSplit]]: proportions hold EXACTLY (to the floor of
  *    n·weight) per stratum, via a distributed rank over the hash
  *    order. One range exchange.
  *  - [[clusterSplit]]: leakage-free — near-duplicate CLUSTERS are
  *    assigned atomically, so no eval document has a near-dup in
  *    train. The split-boundary complement of dedup: deduplication
  *    removes redundancy, cluster-splitting ensures the redundancy
  *    that remains cannot straddle the train/eval boundary
  *    (train-test contamination, Lee et al. 2022 §6).
  *
  * [[crossSplitPairs]] is the leakage CERTIFICATE: the near-dup pairs
  * whose endpoints landed in different splits — empty for
  * [[clusterSplit]] by construction, and the audit row a dataset
  * release should publish either way.
  */
object Splits {

  private val Ppm = 1000000L

  /** Hash of the concatenated key columns — [[TextOps.keyHash]], the
    * ONE convention shared with the sampling family so cross-operator
    * determinism claims hold by construction.
    */
  private def keyHash(keyCols: Seq[String], portable: Boolean): Column =
    TextOps.keyHash(keyCols, portable)

  private def checkSplits(splits: Seq[(String, Int)]): Seq[(String, Long)] = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.map(_._1).distinct.size == splits.size,
      s"duplicate split names in ${splits.map(_._1)}")
    require(splits.forall(_._2 > 0),
      s"split weights must be positive ppm, got $splits")
    require(splits.map(_._2.toLong).sum == Ppm,
      s"split weights must sum to 1000000 ppm, got ${splits.map(_._2).sum}")
    val cum = splits.scanLeft(0L)(_ + _._2).tail
    splits.map(_._1).zip(cum)
  }

  /** `when`-chain over cumulative ppm thresholds: the first split whose
    * cumulative weight exceeds `bucket` wins. The last threshold is
    * exactly `Ppm`, so every bucket value in [0, Ppm) is covered.
    */
  private def splitFor(bucket: Column, cum: Seq[(String, Long)]): Column =
    cum.init.foldRight(lit(cum.last._1)) { case ((name, c), rest) =>
      when(bucket < c, lit(name)).otherwise(rest)
    }

  /** Deterministic hash split: `out` = the split whose cumulative
    * ppm-weight interval contains `hash(key) mod 1e6`.
    *
    * Proportions hold in expectation (each realized count is binomial
    * around n·w/1e6); membership is a pure function of the key, so a
    * document keeps its split across corpus versions — the property
    * that lets incremental corpus releases grow train and eval
    * consistently without ever moving a document across the boundary
    * (a train→eval move is retroactive contamination of every model
    * trained so far).
    *
    * Scale: stateless scan projection — no shuffle, no state, no
    * driver participation. The 100 TB default.
    *
    * @param splits (name, ppm-weight) pairs; weights sum to 1e6
    */
  def hashSplit(df: DataFrame, keyCols: Seq[String],
                splits: Seq[(String, Int)], out: String = "split",
                portable: Boolean = true): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val cum = checkSplits(splits)
    df.withColumn(out, splitFor(keyHash(keyCols, portable) % Ppm, cum))
  }

  /** Exact-proportion split: within each stratum of `strata`, rows are
    * ranked by the portable hash (key columns as tiebreaker) and split
    * `i` takes ranks (floor(n·c_{i-1}/1e6), floor(n·c_i/1e6)] — realized
    * counts are exact to the floor, not binomial. The hash ORDER makes
    * the rank cut deterministic and content-addressed like
    * [[hashSplit]], but membership is no longer stable under corpus
    * growth (adding a row shifts ranks after it) — use this for frozen
    * releases, [[hashSplit]] for growing ones.
    *
    * Scale: one distributed rank ([[Prefix.globalRowNumber]] — range
    * exchange, per-partition windows, no single-partition sort; the
    * same machinery as [[Prefix.stratifiedNtile]]) plus a broadcast of
    * the stratum-cardinality (first-rank, count) relation. All
    * arithmetic is integer (n·cum ≤ rows·1e6 fits a long), so the cut
    * is bit-identical in any engine.
    */
  def exactSplit(df: DataFrame, keyCols: Seq[String],
                 splits: Seq[(String, Int)], strata: Seq[String] = Nil,
                 out: String = "split", portable: Boolean = true): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val cum = checkSplits(splits)
    val h = "__split_h"
    val rn = "__split_rn"
    val hashed = df.withColumn(h, keyHash(keyCols, portable))
    val order = strata.map(col) ++ (col(h) +: keyCols.map(col))
    val ranked = Prefix.globalRowNumber(hashed, order, rn)
    val withStats =
      if (strata.isEmpty) {
        // one global stratum: (first, n) is a single broadcast row
        val stats = ranked.agg(min(col(rn)).as("__first"),
          count(lit(1)).as("__n"))
        ranked.crossJoin(broadcast(stats))
      } else {
        // per-stratum stats, null-safe joined back (NULL strata form
        // their own stratum) — stratifiedNtile's shared machinery
        Prefix.attachStratumStats(ranked, strata.map(col), rn)
      }
    val r = col(rn) - col("__first") + 1
    val assigned = cum.init.foldRight(lit(cum.last._1)) {
      case ((name, c), rest) =>
        when(r <= expr(s"(__n * ${c}L) div ${Ppm}L"), lit(name))
          .otherwise(rest)
    }
    withStats.withColumn(out, assigned).drop(h, rn, "__first", "__n")
  }

  /** Exact k-FOLD assignment for cross-validation: fold = ntile(k)
    * over the portable-hash order (per stratum when `strata` given) —
    * fold sizes differ by at most one row, deterministic and
    * content-addressed like [[exactSplit]] (and like it, not stable
    * under corpus growth — freeze the corpus before folding).
    * [[Prefix.stratifiedNtile]] does the work: distributed rank +
    * ntile's closed form, no per-stratum single-partition sort.
    *
    * @return `df` + `out` (fold 1..k)
    */
  def kFold(df: DataFrame, keyCols: Seq[String], k: Int,
            strata: Seq[String] = Nil, out: String = "fold",
            portable: Boolean = true): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    graft.functions.VectorFunctions.register(df.sparkSession)
    val h = "__fold_h"
    // stratifiedNtile needs >= 1 stratum column (its null-safe stats
    // join reduces over them) — a constant stands in for "global"
    val g = "__fold_g"
    val (base, strataCols) =
      if (strata.isEmpty) (df.withColumn(g, lit(1)), Seq(col(g)))
      else (df, strata.map(col))
    val folded = Prefix.stratifiedNtile(
      base.withColumn(h, keyHash(keyCols, portable)),
      strataCols, col(h) +: keyCols.map(col), k, out)
      .drop(h)
    // drop the synthetic stratum only when WE added it — a caller
    // column of the same name in the stratified branch survives
    if (strata.isEmpty) folded.drop(g) else folded
  }

  /** Grouped k-fold: every row of a GROUP (domain, author, near-dup
    * cluster id — any column whose members must not straddle a
    * train/eval boundary) lands in ONE fold; folds balance group
    * counts, differing by at most one group. The grouped-CV form
    * (scikit-learn's `GroupKFold` shape) of [[kFold]], and the k-fold
    * complement of [[clusterSplit]]'s fixed-ratio split.
    *
    * Scale: fold assignment runs over the DISTINCT groups relation —
    * group cardinality, not row cardinality — through the same
    * content-addressed ntile as [[kFold]] (ONE distributed rank, no
    * single-partition sort), then one group-keyed join attaches folds
    * back; with the usual groups ≪ rows the join side broadcasts.
    *
    * @return `df` + `out` (fold 1..k, identical for all rows of a group)
    */
  def groupKFold(df: DataFrame, groupCol: String, k: Int,
                 out: String = "fold", portable: Boolean = true): DataFrame = {
    val groups = df.select(col(groupCol)).distinct()
    val folds = kFold(groups, Seq(groupCol), k, Nil, out, portable)
    df.join(folds, Seq(groupCol))
  }

  /** Leakage-free split: near-dup CLUSTERS are the unit of assignment.
    *
    * `pairs` is any (id_a, id_b) near-dup relation — Jaccard, MinHash,
    * SimHash, containment, exact-fingerprint — so candidate generation
    * and its scale dials stay in the generators (the
    * [[Corpus.crossSourceDup]] convention). Components come from
    * [[Dedup.connectedComponents]] (min-label propagation); documents
    * in no pair are their own singleton cluster; the split is
    * [[hashSplit]]'s ppm chain over the hash of the CLUSTER id, so
    * every member of a component lands in the same split and
    * [[crossSplitPairs]] over the same relation is empty by
    * construction.
    *
    * Why not split first and audit after: a 0.1% leakage rate at
    * 100 TB is still millions of contaminated eval documents, and
    * post-hoc eviction biases the eval set toward low-duplication
    * content. Atomic cluster assignment has neither problem.
    *
    * Scale: the pair relation is the dominant cost and lives in the
    * generator; components are the bounded-driver union-find with
    * distributed fallback; the assignment itself is one id-keyed join
    * (digests only) + a stateless projection.
    *
    * @return `df` + `clusterOut` (min-id component, own id for
    *         singletons) + `out` (split name)
    */
  def clusterSplit(df: DataFrame, pairs: DataFrame, idCol: String,
                   splits: Seq[(String, Int)],
                   clusterOut: String = "cluster_id", out: String = "split",
                   portable: Boolean = true,
                   ccCheckpointDir: Option[String] = None): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val cum = checkSplits(splits)
    val cc = Dedup.connectedComponents(pairs, checkpointDir = ccCheckpointDir)
      .select(col("id").as("__cc_id"), col("cluster").as("__cc_cluster"))
    val joined = df.join(cc, df(idCol) === cc("__cc_id"), "left")
      .withColumn(clusterOut, coalesce(col("__cc_cluster"), df(idCol)))
      .drop("__cc_id", "__cc_cluster")
    // concat_ws of the single cluster column IS its string cast, so
    // this is the same convention as hashing any other key — including
    // the family-wide NULL rule: a NULL id (⇒ NULL cluster) hashes as
    // the empty string, exactly as hashSample/hashSplit treat NULL key
    // columns, so a null-id row gets a deterministic split instead of
    // falling through the when-chain
    joined.withColumn(out,
      splitFor(keyHash(Seq(clusterOut), portable) % Ppm, cum))
  }

  /** Leakage certificate: the rows of `pairs` whose endpoints sit in
    * DIFFERENT splits of `assign` — the near-dup relations that
    * straddle the train/eval boundary. Empty for [[clusterSplit]] over
    * the same pair relation (by construction); for any other split,
    * the publishable audit statistic.
    *
    * Scale: two id-keyed joins of the pair relation against the
    * (id, split) assignment — pair-relation-sized, digests only.
    */
  def crossSplitPairs(pairs: DataFrame, assign: DataFrame, idCol: String,
                      splitCol: String, idA: String = "id_a",
                      idB: String = "id_b"): DataFrame = {
    val a = assign.select(col(idCol).as("__xa_id"),
      col(splitCol).as("split_a"))
    val b = assign.select(col(idCol).as("__xb_id"),
      col(splitCol).as("split_b"))
    pairs.join(a, pairs(idA) === col("__xa_id"))
      .join(b, pairs(idB) === col("__xb_id"))
      .filter(col("split_a") =!= col("split_b"))
      .drop("__xa_id", "__xb_id")
  }

  /** Deterministic global shuffle + fixed-size training-shard
    * assignment: rows are totally ordered by the portable hash of the
    * key (key columns as tiebreaker — a content-addressed permutation,
    * the "global shuffle" a training run needs so consecutive examples
    * are not corpus-order-correlated), then shard `k` takes ranks
    * [k·shardSize, (k+1)·shardSize) — every shard exactly `shardSize`
    * rows except the last.
    *
    * Scale: ONE distributed rank ([[Prefix.globalRowNumber]] — range
    * exchange on the hash, no single-partition sort). Shard count
    * grows with the corpus at fixed shard size, so downstream
    * parallelism scales; a fixed shard COUNT (size growing with data)
    * would be the anti-pattern.
    *
    * @return `df` + `shardCol` (0-based) + `posCol` (0-based position
    *         within the shard)
    */
  def shardExport(df: DataFrame, keyCols: Seq[String], shardSize: Long,
                  shardCol: String = "shard", posCol: String = "pos",
                  portable: Boolean = true): DataFrame = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    assignShards(df, keyCols, shardSize, 0L, shardCol, posCol, portable)
  }

  /** Curriculum shard export — [[shardExport]] with the hash order
    * replaced by an explicit SCORE order (difficulty ascending: length,
    * surprisal, quality — curriculum learning's easy-to-hard schedule;
    * descending columns flip the curriculum). Shard 0 holds the
    * easiest `shardSize` examples, so a loader reading shards in order
    * IS the curriculum; within a shard, `pos` preserves the score
    * order. Key columns are the deterministic tiebreak, making the
    * export content-addressed like the hash form. Same single
    * distributed rank ([[Prefix.globalRowNumber]] — range exchange, no
    * single-partition sort) and the same div/mod boundary arithmetic.
    *
    * Deliberately NOT unified with [[appendShards]]: a curriculum is a
    * total order over the CURRENT corpus — new easy examples belong
    * before old hard ones, so append-without-re-rank would corrupt the
    * schedule. Re-export per release (or switch to the hash form if
    * incremental append matters more than ordering).
    */
  def curriculumExport(df: DataFrame, orderCols: Seq[Column],
                       keyCols: Seq[String], shardSize: Long,
                       shardCol: String = "shard",
                       posCol: String = "pos"): DataFrame = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    require(orderCols.nonEmpty, "curriculumExport needs a score order")
    val rn = "__curr_rn"
    Prefix.globalRowNumber(df, orderCols ++ keyCols.map(col), rn)
      .withColumn(shardCol,
        expr(s"($rn - 1) div ${shardSize}L").cast("long"))
      .withColumn(posCol, ((col(rn) - 1) % shardSize).cast("long"))
      .drop(rn)
  }

  /** The one definition of the shard-assignment arithmetic: rank by
    * (hash, keys), global positions start at `offset` — [[shardExport]]
    * is the offset-0 form, [[appendShards]] continues from the
    * committed tail. ONE copy on purpose: the hash order and the
    * div/mod boundary arithmetic must stay identical between the fresh
    * and incremental paths.
    */
  private def assignShards(df: DataFrame, keyCols: Seq[String],
                           shardSize: Long, offset: Long, shardCol: String,
                           posCol: String, portable: Boolean): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val h = "__shard_h"
    val rn = "__shard_rn"
    val hashed = df.withColumn(h, keyHash(keyCols, portable))
    Prefix.globalRowNumber(hashed, col(h) +: keyCols.map(col), rn)
      .withColumn(shardCol,
        expr(s"($rn - 1 + ${offset}L) div ${shardSize}L").cast("long"))
      .withColumn(posCol, ((col(rn) - 1 + offset) % shardSize).cast("long"))
      .drop(h, rn)
  }

  /** Materialize a [[shardExport]] assignment as one `shard=K`
    * directory per shard with rows in `pos` order — the on-disk layout
    * a training data loader consumes shard-by-shard.
    *
    * `repartition(shardCol)` puts each shard wholly in one task (many
    * shards per task is fine — rows are sorted by (shard, pos) within
    * the task), so each shard directory gets ONE part file and the
    * file's row order IS the shard order. Parallelism = distinct
    * shards, which grows with the corpus at fixed shard size.
    *
    * `shardSize` (the dial the assignment was computed with) is
    * persisted in a `_graft_shards.json` manifest next to the shard
    * dirs; [[appendShards]] requires manifest equality before touching
    * the layout — the authoritative mismatched-dial guard (content
    * fingerprints can't see the dial when only one shard exists).
    */
  def writeShards(assigned: DataFrame, path: String, shardSize: Long,
                  shardCol: String = "shard", posCol: String = "pos"): Unit = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    writeShardLayout(assigned, path, shardCol, posCol, "overwrite")
    writeManifest(assigned.sparkSession, path, shardSize)
  }

  private val ManifestName = "_graft_shards.json"

  private def writeManifest(spark: org.apache.spark.sql.SparkSession,
                            path: String, shardSize: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, ManifestName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"shardSize": $shardSize}""".getBytes("UTF-8"))
    finally out.close()
  }

  private def readManifestShardSize(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path, ManifestName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var r = in.read(chunk)
        while (r >= 0) { buf.write(chunk, 0, r); r = in.read(chunk) }
        new String(buf.toByteArray, "UTF-8")
      } finally in.close()
      """"shardSize"\s*:\s*(\d+)""".r.findFirstMatchIn(text).map(_.group(1).toLong)
    }
  }

  /** The one definition of the on-disk layout discipline (shard-whole
    * tasks, (shard, pos) sort, `shard=` partition dirs) — shared by the
    * fresh writer (Overwrite) and the incremental appender (Append).
    */
  private def writeShardLayout(assigned: DataFrame, path: String,
                               shardCol: String, posCol: String,
                               mode: String): Unit =
    assigned.repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(posCol))
      .write.mode(mode).partitionBy(shardCol).parquet(path)

  /** INCREMENTAL shard maintenance: append a batch to an existing
    * [[writeShards]] layout without rewriting anything — the release-
    * over-release form of the export. Re-running [[shardExport]] over
    * the grown corpus re-ranks EVERYTHING (every doc can change shard
    * — a full 100 TB rewrite per release, the anti-pattern); here the
    * committed layout is the frozen prefix of the global order: the
    * batch is ranked among itself (same content-addressed hash order)
    * and takes positions starting at the existing tail — first
    * topping up the last partial shard, then opening new ones.
    *
    * Committed FULL shards are never touched (byte-identical,
    * spec-asserted). The topped-up tail shard gains a second part
    * file, so across an append the one-file-per-shard property holds
    * for all shards except tails that were partial at an append
    * boundary — `pos` is the authoritative within-shard order
    * everywhere (loaders sort by it; for single-file shards file
    * order and pos order coincide).
    *
    * Replay is the CALLER's contract, like every sink here: pair the
    * append with a batch ledger (the `foreachBatch` + applied-batch
    * pattern `sink/JdbcMergeSink.mergeOnce` uses) — appending the
    * same batch twice duplicates it.
    *
    * Scale: one shard-column aggregate of the existing layout (a
    * partition-column-only scan — row counts come from parquet
    * footers, data pages never read) + one distributed rank of the
    * BATCH. Per-release cost is batch-sized, committed data never
    * moves.
    *
    * Like [[Layout.compactParquetDir]], the append must be SERIALIZED
    * with other writers of the directory and with readers that need a
    * consistent snapshot — parquet directory appends are not atomic
    * across part files (run it inside the ingest loop's serialized
    * window, as the maintenance ops do).
    *
    * @return Some((firstShard, lastShard)) touched by this append;
    *         None for an empty batch (nothing written)
    */
  def appendShards(path: String, batch: DataFrame, keyCols: Seq[String],
                   shardSize: Long, shardCol: String = "shard",
                   posCol: String = "pos",
                   portable: Boolean = true): Option[(Long, Long)] = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    val spark = batch.sparkSession
    graft.functions.VectorFunctions.register(spark)
    // one evaluation of the batch source for count AND rank; unpersist
    // on EVERY exit (a refused append must not leak the cached batch
    // in the block manager for the rest of the session)
    val b = Materialize.multiScan(batch)
    try {
      val n = b.count()
      if (n == 0L) return None
      // a fresh export vs an append is a FILESYSTEM question, not an
      // exception to swallow — a broad AnalysisException catch would
      // also eat wrong-column errors and silently write shard 0 on top
      // of committed data
      val hPath = new org.apache.hadoop.fs.Path(path)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val exists = fs.exists(hPath)
      // the authoritative dial guard: the manifest [[writeShards]]
      // persisted. Content fingerprints below stay as defense-in-depth
      // but CANNOT see a mismatched dial when the layout holds a single
      // partial shard (50 rows at dial 64 also passes "tail <= 100"),
      // so manifest equality is REQUIRED, not best-effort.
      if (exists) readManifestShardSize(spark, path) match {
        case Some(written) => require(written == shardSize,
          s"shardSize $shardSize does not match the layout's manifest " +
            s"($written) at $path — appending with a different dial " +
            "would corrupt shard/pos arithmetic")
        case None => throw new IllegalArgumentException(
          s"no $ManifestName manifest at $path — not a writeShards " +
            "layout (or a pre-manifest export); re-export with " +
            "writeShards, which persists the shardSize dial")
      }
      // existing top TWO shards + fills (shard-cardinality rows, counted
      // from footers — no data columns read; the partition column comes
      // back from directory names as an INT, normalize to long)
      val tail: Seq[(Long, Long)] =
        if (!exists) Nil
        else spark.read.parquet(path)
          .groupBy(col(shardCol).cast("long").as(shardCol))
          .agg(count(lit(1)).as("__n"))
          .orderBy(col(shardCol).desc).limit(2)
          .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      val offset = tail.headOption match {
        case Some((maxShard, fill)) => maxShard * shardSize + fill
        case None                   => 0L
      }
      require(tail.headOption.forall(_._2 <= shardSize),
        s"existing tail shard overfull: ${tail.headOption} at shardSize " +
          s"$shardSize — was the layout written with a different shardSize?")
      // every non-tail shard is exactly full BY CONSTRUCTION, so the
      // second-highest shard doubles as a shardSize fingerprint —
      // defense-in-depth behind the manifest check above
      require(tail.drop(1).forall(_._2 == shardSize),
        s"shard ${tail.drop(1).headOption} is not exactly $shardSize rows " +
          "— the layout was written with a different shardSize")
      writeShardLayout(
        assignShards(b, keyCols, shardSize, offset, shardCol, posCol,
          portable),
        path, shardCol, posCol, "append")
      // an append that CREATES the layout must leave it appendable
      if (!exists) writeManifest(spark, path, shardSize)
      Some((offset / shardSize, (offset + n - 1) / shardSize))
    } finally b.unpersist()
  }
}
