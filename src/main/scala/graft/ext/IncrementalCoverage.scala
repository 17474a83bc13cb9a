package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The operational loop for duplicated-SPAN admission control: the
  * streaming complement of [[Dedup.substringDupCoverage]], in the same
  * `foreachBatch` family as [[IncrementalDedup]] / [[IncrementalAnn]].
  * Each arriving document is scored for how much of it is covered by
  * spans repeated in the ADMITTED CORPUS SO FAR (or elsewhere in its
  * own batch), and is rejected when that coverage reaches `dropAtBp` —
  * mirrors, quote farms, and licence boilerplate are turned away at the
  * door instead of surviving until the next offline ExactSubstr sweep.
  *
  * Per-tick semantics (exactly [[Dedup.substringDupCoverage]]'s scoring
  * with the corpus-so-far as context): a window is DUP if its
  * fingerprint is in the span index (some admitted doc contained it) or
  * occurs ≥ 2 times within the batch; coverage is the interval union of
  * dup windows in UTF-8 bytes of the normalized text over
  * `octet_length` of the same. Docs at/above `dropAtBp` are rejected;
  * survivors append to the corpus and their distinct new span
  * fingerprints to the index. Like the batch operator, a batch that
  * carries several copies of the same boilerplate-dominated document
  * drops ALL of them — this is a coverage guard, not first-wins exact
  * dedup ([[graft.streaming.StreamCompaction.firstPerFingerprint]] is
  * that).
  *
  * Scale posture: state is the fingerprint store — 32-byte digests of
  * admitted spans PLUS one whole-document fingerprint per admitted doc,
  * never text — read as a semi-join side and appended per tick;
  * per-tick cost is batch windows × one join against the store.
  * Replay-idempotent for EVERY document shape: an anchor-bearing doc
  * re-scores 10000 bp against its own indexed spans, and a doc below
  * the window length (or whose text carries no anchor — probability
  * (1-1/anchorMod)^(len-win+1)) is caught by its document fingerprint,
  * which doubles as an exact-duplicate gate across batches. Bin-pack
  * the two directories with [[IncrementalDedup.maintain]] every N
  * ticks inside the same serialized window.
  */
object IncrementalCoverage {

  /** One admission tick. Returns (admitted, dropped); appends survivors
    * to `corpusDir` and their new span + document fingerprints to
    * `spanIndexDir` (both created on first use). Caller serializes
    * ticks (foreachBatch already does).
    */
  def admitBatch(batch: DataFrame, idCol: String, textCol: String,
                 corpusDir: String, spanIndexDir: String,
                 winBytes: Int = 40, anchorMod: Int = 8,
                 dropAtBp: Int = 5000): (Long, Long) = {
    val spark = batch.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val n = batch.count()
    val indexFps = fpsIfExist(spark, spanIndexDir)
    // whole-document fingerprints make redelivery idempotent regardless
    // of anchor density (and reject exact cross-batch duplicates): the
    // doc fp lives in the same 32-byte digest store as the span fps
    val docFps = Materialize.multiScan(batch.select(
      col(idCol).as("id"), TextOps.fingerprint(col(textCol)).as("fp")))
    val exactDrops = indexFps match {
      case Some(idx) => docFps.join(idx, Seq("fp")).select(col("id"))
      case None => docFps.select(col("id")).limit(0)
    }
    val wins = Materialize.multiScan(
      Dedup.anchorWins(batch, idCol, textCol, winBytes, anchorMod))
    val batchDupFps = wins.groupBy(col("fp"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select(col("fp"))
    val dupFps = indexFps match {
      case Some(idx) => batchDupFps.unionByName(idx).distinct()
      case None => batchDupFps
    }
    val dup = wins.join(dupFps, Seq("fp"))
    val base = batch.select(col(idCol).as("id"),
      octet_length(TextOps.normalized(col(textCol))).as("n_bytes"))
    val dropIds = Materialize.multiScan(
      Dedup.coverageOf(dup, base, winBytes)
        .filter(col("cov_bp") >= dropAtBp).select(col("id"))
        .unionByName(exactDrops).distinct())
    val admitted = Materialize.multiScan(
      batch.join(dropIds, batch(idCol) === dropIds("id"), "left_anti"))
    val nAdmitted = admitted.count()
    if (nAdmitted > 0) {
      admitted.write.mode(SaveMode.Append).parquet(corpusDir)
      // only NEW fingerprints append — the store stays distinct, so the
      // dup-side join never inflates
      val admittedFps = wins.select(col("id"), col("fp"))
        .unionByName(docFps)
        .join(dropIds, Seq("id"), "left_anti")
        .select(col("fp")).distinct()
      (indexFps match {
        case Some(idx) => admittedFps.join(idx, Seq("fp"), "left_anti")
        case None => admittedFps
      }).write.mode(SaveMode.Append).parquet(spanIndexDir)
    }
    Seq(docFps, wins, dropIds, admitted).foreach(_.unpersist())
    (nAdmitted, n - nAdmitted)
  }

  private def fpsIfExist(spark: SparkSession,
                         dir: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) Some(spark.read.parquet(dir)) else None
  }
}
