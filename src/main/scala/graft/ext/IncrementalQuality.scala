package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Streaming QUALITY admission — the model/rule-scorer complement of
  * [[IncrementalCoverage]] (span dedup at the door) and
  * [[IncrementalDedup]] (near-dup at the door) in the same
  * `foreachBatch` family: every arriving document passes the frozen
  * curation gates or is turned away.
  *
  * The gates are the batch ladder's own scorers with their parameters
  * FROZEN at deploy time:
  *
  *   1. the Gopher rule battery ([[Corpus.gopherRules]]) — stateless
  *      document-shape rules;
  *   2. the fastText-style linear quality classifier
  *      ([[Corpus.qualityScore]]) against a fixed hashed-n-gram weight
  *      table;
  *   3. optionally, the Gopher REPETITION battery
  *      ([[Corpus.repetitionSignals]]) — also stateless and doc-local
  *      (all signals are within-document counts), so it freezes to its
  *      dials alone; the same rung-1 pairing the batch ladder
  *      (`q_corpus_prep_v3`) gates on;
  *   4. optionally, a DSIR importance threshold
  *      ([[Corpus.dsirScoreAgainst]]) against a λ table trained ONCE
  *      ([[Corpus.dsirLambda]]) on a reference (raw, target) pair;
  *   5. optionally, the perplexity gate ([[Corpus.surprisalAgainst]])
  *      against a unigram LM trained ONCE ([[Corpus.unigramLm]]) —
  *      the streamable form of the batch ladder's tercile rung: the
  *      tercile BOUNDARY observed on the training corpus freezes into
  *      `maxMeanSurprisalX10k`, and scoring is doc-local against the
  *      broadcast LM (unseen tokens priced as rare).
  *
  * Scale posture — the whole point of freezing: the weight and λ
  * tables are nBuckets-row broadcasts regardless of corpus size, every
  * score is doc-local, and there is NO store to probe or grow — per-
  * tick cost is batch-sized and estimation state is ZERO. (Contrast
  * [[IncrementalCoverage]], whose fingerprint store necessarily grows
  * with the admitted corpus.)
  *
  * Exactly-once: admitted rows land in a PER-BATCH subdirectory
  * (`corpusDir/batch=<batchId>`) written with Overwrite — a redelivered
  * batch (checkpoint replay after a crash) rewrites its own directory
  * byte-for-byte instead of appending duplicates. Since scoring is
  * deterministic in (document, frozen tables), replay produces the
  * identical admitted set; no ledger and no read-back of the corpus is
  * needed. Consumers read `corpusDir` recursively (the `batch=` layout
  * is a plain partition column).
  *
  * Because every gate is doc-local against frozen tables, the streamed
  * admission over any partitioning of a corpus into batches equals the
  * batch ladder run once over the union — the mergeability property the
  * parity spec pins.
  */
object IncrementalQuality {

  /** One admission tick (a `foreachBatch` body). Returns
    * (admitted, dropped); writes survivors (plus their scores) to
    * `corpusDir/batch=<batchId>`.
    *
    * @param weights     frozen (bucket, w) quality-classifier table
    * @param lambda      optional frozen (bucket, lam) DSIR table
    *                    ([[Corpus.dsirLambda]]); docs at/above
    *                    `dsirThrX10k` pass
    * @param thrMilli    quality-logit admission threshold (milli-units
    *                    per feature, [[Corpus.qualityScore]]'s contract)
    * @param minWords    Gopher word-count window lower edge (the other
    *                    rules keep their published defaults)
    * @param repetition  gate on [[Corpus.repetitionSignals]] too (dials
    *                    below; published-default maps), completing the
    *                    batch ladder's rung-1 pairing
    * @param lm          optional frozen (token, nat10k) unigram LM
    *                    ([[Corpus.unigramLm]]); docs with mean
    *                    surprisal at/below `maxMeanSurprisalX10k` pass
    *                    (the frozen tercile boundary — CCNet keeps the
    *                    head+middle)
    */
  def admitBatch(batch: DataFrame, batchId: Long, idCol: String,
                 textCol: String, corpusDir: String,
                 weights: DataFrame, nBuckets: Int = 1024,
                 thrMilli: Long = 0L,
                 lambda: Option[DataFrame] = None, dsirThrX10k: Long = 0L,
                 minWords: Int = 50,
                 stopwords: Seq[String] = Corpus.GopherStopwords,
                 repetition: Boolean = false,
                 repTopBpMax: Map[Int, Long] =
                   Map(2 -> 2000L, 3 -> 1800L, 4 -> 1600L),
                 repDupBpMax: Map[Int, Long] =
                   Map(5 -> 1500L, 6 -> 1400L, 7 -> 1300L,
                       8 -> 1200L, 9 -> 1100L, 10 -> 1000L),
                 lm: Option[DataFrame] = None,
                 maxMeanSurprisalX10k: Long = Long.MaxValue,
                 unseenNat10k: Long = 200000L): (Long, Long) = {
    val n = batch.count()
    // all scores are doc-local: compute over the batch, intersect
    // the keeps — same composition contract as the batch ladder
    val gKeep = Corpus.gopherRules(batch, idCol, textCol,
        minWords = minWords, stopwords = stopwords)
      .filter(col("keep")).select(col("id"))
    val qKeep = Corpus.qualityScore(batch, idCol, textCol, weights,
        nBuckets, thrMilli)
      .filter(col("keep")).select(col("id"))
    val keepGq = gKeep.join(qKeep, Seq("id"))
    val keep0 =
      if (!repetition) keepGq
      else keepGq.join(
        Corpus.repetitionSignals(batch, idCol, textCol,
            topBpMax = repTopBpMax, dupBpMax = repDupBpMax)
          .filter(col("keep")).select(col("id")),
        Seq("id"))
    val keep1 = lambda.fold(keep0) { lam =>
      keep0.join(
        Corpus.dsirScoreAgainst(batch, lam, idCol, textCol, nBuckets)
          .filter(col("dsir_x10k") >= dsirThrX10k).select(col("id")),
        Seq("id"))
    }
    val keepIds = lm.fold(keep1) { table =>
      keep1.join(
        Corpus.surprisalAgainst(batch, table, idCol, textCol, unseenNat10k)
          .filter(col("mean_surprisal_x10k") <= maxMeanSurprisalX10k)
          .select(col("id")),
        Seq("id"))
    }
    val admitted = Materialize.multiScan(
      batch.join(keepIds, batch(idCol) === keepIds("id"), "left_semi"))
    val nAdmitted = admitted.count()
    // per-batch directory + Overwrite = replay-idempotent without state
    admitted.write.mode(SaveMode.Overwrite)
      .parquet(s"$corpusDir/batch=$batchId")
    admitted.unpersist()
    (nAdmitted, n - nAdmitted)
  }
}
