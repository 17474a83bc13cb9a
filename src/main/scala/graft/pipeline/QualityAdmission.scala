package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.AdmissionConf
import graft.ext.{Corpus, IncrementalQuality, Materialize}

/** The streaming QUALITY admission stage of the CDC pipeline — the
  * frozen five-gate curation battery ([[graft.ext.IncrementalQuality]])
  * applied between compaction and the sink fanout: envelope-parse →
  * compact → ADMIT → merge as one stream. An extension beyond the
  * reference's surface (its pipeline replicates everything); the gate
  * set and the frozen-table posture are the batch curation ladder's
  * (`q_corpus_prep_v3`) with parameters frozen at deploy time.
  *
  * Semantics:
  *   - DELETES ALWAYS PASS. A delete carries no document text, and
  *     turning one away would break replication (the warehouse would
  *     keep a row the source removed).
  *   - rows whose `text_expr` evaluates NULL pass — non-document tables
  *     sharing the stream, or documents whose payload lacks the text
  *     field, cannot be scored and admission is a quality filter, not a
  *     schema validator.
  *   - every other row is scored doc-locally against the frozen tables
  *     and must clear EVERY configured gate.
  *
  * Scale posture (inherited from the gate): the frozen tables are
  * nBuckets-/vocabulary-sized broadcasts loaded once at startup; every
  * score is doc-local; there is no store and no state growth — per-tick
  * cost is batch-sized. The batch makes ONE tokenize pass (the gates
  * read a shared spill-safe cache).
  *
  * Exactly-once: admission is deterministic in (row, frozen tables), so
  * a checkpoint replay admits the identical subset — the merge sink's
  * ledger semantics are untouched. The optional rejected-row audit
  * trail uses the per-batch-directory Overwrite layout, replay-
  * idempotent like [[graft.ext.IncrementalQuality.admitBatch]]'s corpus.
  */
object QualityAdmission {

  /** Build a [[CdcPipeline]] admission hook from config. Frozen tables
    * load once, here — NOT per batch. The returned hook's output
    * contract: a PERSISTED, materialized DataFrame the pipeline
    * unpersists when the batch completes.
    */
  def fromConfig(spark: SparkSession, cfg: AdmissionConf,
                 deleteMarker: String): (DataFrame, Long) => DataFrame = {
    // frozen tables are small (nBuckets / vocabulary rows): cache them so
    // every batch broadcasts from memory instead of re-reading parquet
    val weights = Materialize.multiScan(spark.read.parquet(cfg.weights_path))
    val lambda = cfg.dsir_lambda_path.map(p =>
      Materialize.multiScan(spark.read.parquet(p)))
    val lm = cfg.lm_path.map(p => Materialize.multiScan(spark.read.parquet(p)))
    (compacted, batchId) =>
      admit(compacted, batchId, cfg, deleteMarker, weights, lambda, lm)
  }

  /** One admission pass over a compacted batch (the hook body).
    * @return persisted, materialized admitted relation (same schema as
    *         `compacted`); caller unpersists after the batch.
    */
  def admit(compacted: DataFrame, batchId: Long, cfg: AdmissionConf,
            deleteMarker: String, weights: DataFrame,
            lambda: Option[DataFrame], lm: Option[DataFrame]): DataFrame = {
    val withText = compacted.withColumn("__adm_text", expr(cfg.text_expr))
    val bypassCond = col("op") === lit(deleteMarker) ||
      col("__adm_text").isNull
    val bypass = withText.filter(bypassCond).drop("__adm_text")
    // the compacted key (db_name, tb_name, pk) is unique per batch row
    // (compaction guarantees it) — fold it into the gate's doc id
    val docs = withText.filter(!bypassCond)
      .withColumn("__adm_id",
        concat_ws("", col("db_name"), col("tb_name"), col("pk")))
    val g = IncrementalQuality.gate(docs, "__adm_id", "__adm_text",
      weights, cfg.n_buckets, cfg.thr_milli,
      lambda, cfg.dsir_thr_x10k, cfg.min_words,
      Corpus.GopherStopwords, cfg.repetition,
      Map(2 -> 2000L, 3 -> 1800L, 4 -> 1600L),
      Map(5 -> 1500L, 6 -> 1400L, 7 -> 1300L,
          8 -> 1200L, 9 -> 1100L, 10 -> 1000L),
      lm, cfg.max_mean_surprisal_x10k.getOrElse(Long.MaxValue),
      cfg.unseen_nat10k,
      cfg.c4_rules, cfg.c4_bad_words.getOrElse(Nil))
    val admittedDocs = g.admitted.drop("__adm_text", "__adm_id")
    val out = Materialize.multiScan(admittedDocs.unionByName(bypass))
    out.count() // materialize while the gate's caches are live
    // audit trail of turned-away rows, replay-idempotent per-batch dir
    cfg.rejected_dir.foreach { dir =>
      docs.join(g.admitted.select(col("__adm_id")), Seq("__adm_id"),
          "left_anti")
        .drop("__adm_text", "__adm_id")
        .write.mode(SaveMode.Overwrite).parquet(s"$dir/batch=$batchId")
    }
    g.release()
    out
  }
}
