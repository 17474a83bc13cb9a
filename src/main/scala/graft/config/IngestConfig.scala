package graft.config

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Config for the CURATION ingest loop ([[graft.tools.RunIngest]]) —
  * the LLM-pipeline twin of [[JobConfig]]'s CDC contract: one JSON file
  * freezes every rung dial, the gate battery, the maintenance cadence
  * and the monitor thresholds, so a deployment is
  * `spark-submit … RunIngest ingest_config.json` instead of re-deriving
  * the `foreachBatch` choreography from scaladoc. Integer fixed-point
  * dials follow the [[AdmissionConf]] convention (τ in 1e-4 units).
  */
final case class IngestGatesConf(
    /** Frozen (bucket, w) quality-classifier weight table (parquet) —
      * the `quality` rung; see [[graft.ext.IngestLadder.frozenGates]]. */
    weights_path: String,
    n_buckets: Int = 1024,
    thr_milli: Long = 0L,
    min_words: Int = 50,
    /** Gate on the Gopher repetition battery too (published dials). */
    repetition: Boolean = false,
    /** Frozen (bucket, lam) DSIR table (parquet); absent = off. */
    dsir_lambda_path: Option[String] = None,
    dsir_thr_x10k: Long = 0L,
    /** Gate on the C4 cleaning battery (raw text, line structure). */
    c4_rules: Boolean = false,
    c4_bad_words: Option[List[String]] = None,
    /** Frozen learned language-id model (parquet,
      * [[graft.ext.Corpus.langIdTrain]] layout); absent = off. */
    lang_model_path: Option[String] = None,
    allowed_langs: List[String] = List("en"),
    lang_n: Int = 3,
    lang_n_buckets: Int = 4096)

final case class IngestMonitorConf(
    /** Expected steady per-rung drop rate, slack, and alarm threshold
      * in integer basis points — the [[graft.ext.LadderRungMonitor]] /
      * [[graft.ext.DataQuality.cusumTick]] dials. */
    mu_bp: Long,
    kappa_bp: Long,
    h_bp: Long,
    /** Rungs to watch; absent = every built-in rung (an off rung can
      * never page — the activity-gated down-alarm semantics). */
    rungs: Option[List[String]] = None)

final case class IngestConfig(
    /** Streaming source: a file format (`parquet`/`json`/`csv`, with
      * `source_path` + `source_schema_ddl`) or `kafka` (with
      * `source_options` carrying the broker contract and
      * `source_schema_ddl` describing the JSON value payload). */
    source_format: String,
    source_path: Option[String] = None,
    source_options: Map[String, String] = Map.empty,
    /** DDL schema of the document relation, e.g.
      * `doc_id LONG, text STRING, url STRING` — file streams require
      * it; the kafka path `from_json`s the value column with it. */
    source_schema_ddl: Option[String] = None,
    id_col: String,
    text_col: String,
    url_col: Option[String] = None,
    /** Ladder root: the six subtrees + sidecars + markers live here. */
    root: String,
    checkpoint_location: String,
    /** Processing-time trigger, e.g. "30 seconds"; absent = as-fast. */
    trigger: Option[String] = None,
    // ---- rung dials --------------------------------------------------
    shingle_n: Int = 3,
    near_tau_x10k: Long = 5000L,
    max_doc_freq: Option[Int] = None,
    containment_tau_x10k: Option[Long] = None,
    line_dedup: Boolean = false,
    domain_quota: Option[Int] = None,
    /** Full PSL rules file (one raw-syntax rule per line, wildcards/
      * exceptions included) for the domain rung's eTLD+1 resolution;
      * absent = the embedded scalar subset. */
    psl_rules_path: Option[String] = None,
    gates_conf: Option[IngestGatesConf] = None,
    // ---- maintenance cadence ----------------------------------------
    /** Run [[graft.ext.IncrementalDedup.reconcileWindow]] every N
      * ticks (`batchId % N == N - 1`): incremental reconcile + apply +
      * opt-in retention + fold + sidecar rebuild. */
    maintain_every: Long = 16L,
    retire_evidence: Boolean = false,
    retire_lag_windows: Int = 0,
    refund_quota: Boolean = false,
    /** Build bloom sidecars at the first maintenance window (rebuilt
      * on every later fold automatically). */
    build_sidecars: Boolean = false,
    target_bytes: Long = 128L << 20,
    monitor_conf: Option[IngestMonitorConf] = None)

object IngestConfig {
  private implicit val formats: Formats = DefaultFormats

  def fromJson(json: String): IngestConfig =
    JsonMethods.parse(json).extract[IngestConfig]

  def fromFile(path: String): IngestConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
