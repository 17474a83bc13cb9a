package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The operational loop for a continuously-admitted, near-dup-free
  * corpus: each arriving batch is checked against a PERSISTENT SimHash
  * signature index (8 bytes per admitted document), survivors join the
  * corpus and their signatures join the index. Designed as a
  * `foreachBatch` body — the batch-at-a-time complement of
  * [[graft.streaming.StreamCompaction.firstPerFingerprint]] (exact,
  * state-store) for NEAR duplicates, whose candidate join does not fit
  * keyed state.
  *
  * Admission semantics per batch:
  *  1. in-batch: among near-dup batch pairs ([[Dedup.simhashPairs]]),
  *     the lowest id of each connected group survives (min-label over
  *     the pair list, [[Dedup.connectedComponents]]);
  *  2. cross-batch: any batch doc within `maxDist` of an INDEXED
  *     signature ([[Dedup.simhashAgainst]]) is dropped — first
  *     arrival wins across batches, matching the streaming exact-dedup
  *     contract.
  *
  * At 100 TB the index is the scale lever: one long + one id per
  * admitted document (write it partitioned/bucketed by band key for
  * co-located joins); the corpus text is never re-read or self-paired
  * by an ingest tick.
  */
object IncrementalDedup {

  /** One admission tick. Returns (admitted, droppedInBatch,
    * droppedVsIndex) row counts; appends survivors to `corpusDir` and
    * their signatures to `indexDir` (both created on first use).
    * Caller serializes ticks (foreachBatch already does).
    */
  def admitBatch(batch: DataFrame, idCol: String, textCol: String,
                 corpusDir: String, indexDir: String,
                 maxDist: Int): (Long, Long, Long) = {
    val spark = batch.sparkSession
    val n = batch.count()
    // signatures are used by up to three joins below: compute once
    val sigs = Materialize.multiScan(
      Dedup.simhashSignatures(batch, idCol, textCol))
    // 1. in-batch collapse: keep each near-dup group's lowest id
    val inBatchPairs = Dedup.simhashAgainst(sigs, sigs, maxDist)
      .filter(col("batch_id") < col("corpus_id"))
      .select(col("batch_id").as("id_a"), col("corpus_id").as("id_b"))
    val inBatchDrops = Dedup.connectedComponents(inBatchPairs)
      .filter(col("id") =!= col("cluster")) // non-minimum group members
      .select(col("id"))
    // 2. cross-batch: drop anything near an indexed signature
    val vsIndexDrops = indexIfExists(spark, indexDir) match {
      case Some(index) => Dedup.simhashAgainst(sigs, index, maxDist)
        .select(col("batch_id").as("id")).distinct()
      case None => inBatchDrops.limit(0)
    }
    val dropIds = Materialize.multiScan(
      inBatchDrops.unionByName(vsIndexDrops).distinct())
    val admitted = Materialize.multiScan(
      batch.join(dropIds, batch(idCol) === dropIds("id"), "left_anti"))
    val nAdmitted = admitted.count()
    if (nAdmitted > 0) {
      admitted.write.mode(SaveMode.Append).parquet(corpusDir)
      sigs.join(dropIds, sigs("id") === dropIds("id"), "left_anti")
        .select(sigs("id"), col("sig"))
        .write.mode(SaveMode.Append).parquet(indexDir)
    }
    val nInBatch = inBatchDrops.count()
    Seq(sigs, dropIds, admitted).foreach(_.unpersist())
    (nAdmitted, nInBatch, n - nAdmitted - nInBatch)
  }

  /** One CONTAINMENT admission tick — the steady-state form of the
    * embedded-quote check: each arriving batch is probed against a
    * PERSISTENT shingle-postings index ([[Dedup.shinglePostings]], 20
    * bytes per distinct shingle per admitted doc) so corpus text is
    * never re-read or re-tokenized; survivors join the corpus and
    * their postings join the index ([[Dedup.containmentProbe]] scores
    * probes with the exact [[Dedup.containmentAgainst]] join, so the
    * stored path is row-for-row the recompute-from-text path).
    *
    * Admission semantics per batch (first arrival wins, like
    * [[admitBatch]]):
    *  1. in-batch: a doc x is dropped when its shingle set is
    *     τ-contained in ANOTHER batch doc y that itself SURVIVES the
    *     cross-batch index probe — unless the containment is MUTUAL
    *     (near-identical docs) and x is the lower id, which keeps
    *     exactly one survivor per mutual group while embedded docs
    *     (one-directional containment) always drop. A containment
    *     CHAIN (a ⊂ b ⊂ c) keeps its maximal host: every non-maximal
    *     member has an outgoing one-directional edge. The
    *     host-must-survive condition matters because τ-containment is
    *     NOT transitive for τ < 1: if y is turned away by the index
    *     (y ⊂τ indexed doc) but x ⊄τ that indexed doc, dropping x "for
    *     y" would silently lose x's content — no admitted or indexed
    *     doc would τ-contain it. Restricting hosts to index survivors
    *     closes that cascade: x drops only when something that is (or
    *     will be) in the corpus τ-contains it.
    *  2. cross-batch: a batch doc τ-contained in an INDEXED doc
    *     (cont_batch ≥ τ) is dropped — the embedded-quote admission
    *     signal. The reverse direction (batch doc SWALLOWS an admitted
    *     doc, cont_corpus ≥ τ) does NOT drop: the arriving doc carries
    *     novel content; replacing the admitted subset doc is a
    *     compaction policy, not an admission one.
    *
    * At 100 TB: the index is postings-sized — the honest price of
    * exact containment (no fixed-width sketch preserves the
    * doc-inside-doc relation); write it bucketed by sh64 for
    * co-located probes, and dial `maxDocFreq` (applied to the index
    * side AT PROBE TIME, so the stored index stays exact) to keep
    * boilerplate shingles out of the join — the measured 43.7 s → 2 s
    * defense, see SCALE.md.
    *
    * @return (admitted, droppedInBatch, droppedVsIndex) row counts;
    *         survivors appended to `corpusDir`, their postings to
    *         `postingsDir` (both created on first use). Caller
    *         serializes ticks (foreachBatch already does).
    */
  def admitBatchContainment(batch: DataFrame, idCol: String,
                            textCol: String, corpusDir: String,
                            postingsDir: String, n: Int, tau: Double,
                            maxDocFreq: Int = Int.MaxValue): (Long, Long, Long) = {
    val spark = batch.sparkSession
    val nRows = batch.count()
    // postings feed up to three joins below: compute once
    val posts = Materialize.multiScan(
      Dedup.shinglePostings(batch, idCol, textCol, n))
    // 1. cross-batch FIRST: drop batch docs contained in an indexed doc.
    // Computed before the in-batch pass because its drops also disqualify
    // docs from serving as in-batch HOSTS (used twice below).
    val vsIndexDrops = Materialize.multiScan(
      indexIfExists(spark, postingsDir) match {
        case Some(index) => Dedup.containmentProbe(posts, index, tau, maxDocFreq)
          .filter(col("cont_batch") >= tau)
          .select(col("batch_id").as("id")).distinct()
        case None => posts.select(col("id")).limit(0)
      })
    // 2. in-batch collapse, hosts restricted to index SURVIVORS: a drop
    // of x must be justified by a y whose content actually reaches the
    // corpus (τ-containment is not transitive for τ < 1 — an index-
    // dropped y cannot vouch for x, see the admission-semantics doc).
    // The probe emits each unordered pair in both orders (no
    // id-ordering condition exists in the A-vs-B join), which is
    // exactly what the asymmetric drop rule consumes: from the
    // (x=batch_id, y=corpus_id) orientation, x drops iff x ⊂τ y and NOT
    // (mutual ∧ x < y).
    val hostPosts = posts.join(vsIndexDrops,
      posts("id") === vsIndexDrops("id"), "left_anti")
    val inBatchDrops = Dedup.containmentProbe(posts, hostPosts, tau)
      .filter(col("batch_id") =!= col("corpus_id"))
      .filter(col("cont_batch") >= tau &&
        !(col("cont_corpus") >= tau && col("batch_id") < col("corpus_id")))
      .select(col("batch_id").as("id")).distinct()
    val dropIds = Materialize.multiScan(
      inBatchDrops.unionByName(vsIndexDrops).distinct())
    val admitted = Materialize.multiScan(
      batch.join(dropIds, batch(idCol) === dropIds("id"), "left_anti"))
    val nAdmitted = admitted.count()
    if (nAdmitted > 0) {
      admitted.write.mode(SaveMode.Append).parquet(corpusDir)
      posts.join(dropIds, posts("id") === dropIds("id"), "left_anti")
        .select(posts("id"), col("m"), col("sh64"))
        .write.mode(SaveMode.Append).parquet(postingsDir)
    }
    val nInBatch = inBatchDrops.count()
    Seq(posts, vsIndexDrops, dropIds, admitted).foreach(_.unpersist())
    (nAdmitted, nInBatch, nRows - nAdmitted - nInBatch)
  }

  /** One URL-FIRST-SEEN admission tick — the steady-state BATCH form of
    * the crawl frontier. The state-store streaming form
    * ([[graft.streaming.StreamCompaction.firstPerCanonicalUrl]]) keys
    * per-URL state in the stream's store; this is the parquet-index
    * form whose state a 10¹⁰-page frontier actually holds: the index is
    * one (url_key, keep_id) row per admitted page (tens of bytes),
    * probed by an id-keyed anti-join — no text is ever read, making
    * this the CHEAPEST rung of the admission ladder, run before any
    * content pass.
    *
    * Admission per batch (first arrival wins, the [[admitBatch]]
    * contract): in-batch, syntactic crawl variants of one page
    * ([[TextOps.canonicalUrl]] collapses them) keep the minimum id;
    * cross-batch, any canonical key already in the index drops.
    *
    * @return (admitted, droppedInBatch, droppedVsIndex) row counts;
    *         survivors appended to `corpusDir`, their (url_key,
    *         keep_id) rows to `indexDir` (created on first use).
    *         Caller serializes ticks (foreachBatch already does).
    */
  def admitBatchUrl(batch: DataFrame, idCol: String, urlCol: String,
                    corpusDir: String, indexDir: String): (Long, Long, Long) = {
    val spark = batch.sparkSession
    val nRows = batch.count()
    val keyed = Materialize.multiScan(
      batch.withColumn("__url_key", TextOps.canonicalUrl(col(urlCol))))
    // in-batch collapse: one row per canonical key, minimum id
    val firsts = Materialize.multiScan(
      keyed.groupBy(col("__url_key")).agg(min(col(idCol)).as("__keep")))
    // cross-batch: keys already admitted drop whole
    val admittedFirsts = Materialize.multiScan(
      indexIfExists(spark, indexDir) match {
        case Some(ix) => firsts.join(
          ix.select(col("url_key").as("__url_key")), Seq("__url_key"),
          "left_anti")
        case None => firsts
      })
    val admitted = Materialize.multiScan(
      keyed.join(admittedFirsts,
          keyed("__url_key") === admittedFirsts("__url_key") &&
            keyed(idCol) === admittedFirsts("__keep"), "left_semi")
        .drop("__url_key"))
    val nAdmitted = admitted.count()
    if (nAdmitted > 0) {
      admitted.write.mode(SaveMode.Append).parquet(corpusDir)
      admittedFirsts.select(col("__url_key").as("url_key"),
          col("__keep").as("keep_id"))
        .write.mode(SaveMode.Append).parquet(indexDir)
    }
    val nKeys = firsts.count()
    Seq(keyed, firsts, admittedFirsts, admitted).foreach(_.unpersist())
    // every batch row beyond its key's first is an in-batch variant
    (nAdmitted, nRows - nKeys, nKeys - nAdmitted)
  }

  private def indexIfExists(spark: SparkSession,
                            indexDir: String): Option[DataFrame] =
    // data-file probe, not a bare directory probe: a footer-less tree
    // (all-rejected first batch) must read as "no index yet", not
    // throw 'Unable to infer schema' forever after
    if (Layout.hasParquetData(spark, indexDir))
      Some(spark.read.parquet(indexDir))
    else None

  /** Periodic index maintenance: bin-pack the corpus and signature
    * directories ([[Layout.compactParquetDir]]). Every tick appends at
    * least one part file to each, so an unattended loop accumulates
    * files linearly in tick count — the small-files failure mode that
    * dominates scan cost at 100 TB. Call every N ticks INSIDE the same
    * serialized window that runs [[admitBatch]] (e.g. from the
    * `foreachBatch` body on `batchId % N == N - 1`): the compaction
    * contract requires no concurrent writer or reader of these
    * directories, and the loop's own serialization provides exactly
    * that. Returns (corpus files, index files) after packing; a
    * not-yet-created directory counts 0 and is skipped.
    */
  def maintain(spark: SparkSession, corpusDir: String, indexDir: String,
               targetBytes: Long = 128L << 20): (Int, Int) =
    (compactIfExists(spark, corpusDir, targetBytes),
      compactIfExists(spark, indexDir, targetBytes))

  private[ext] def compactIfExists(spark: SparkSession, dir: String,
                                   targetBytes: Long): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) Layout.compactParquetDir(spark, dir, targetBytes)
    else 0
  }
}
