package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Normalized CDC event for the typed streaming path (the streaming
  * analogue of the columns produced by [[graft.envelope.CdcFormat]]).
  */
final case class CdcEvent(
    db_name: String, tb_name: String, pk: String,
    ts_ms: Long, offset: Long, op: String, payload: String)

/** Streaming-native cross-batch compaction — the extension the reference
  * never built (its state lives in the warehouse; every batch's stale
  * events still reach Redshift and are resolved by delete-then-insert,
  * SURVEY.md §2.8). Here a keyed state store suppresses stale events
  * INSIDE the stream, so sinks receive exactly the winning version per
  * key per trigger:
  *
  *  - `latestPerKeyStateful`: flatMapGroupsWithState keeps (ts_ms,
  *    offset) per key; an event is emitted only if it beats the stored
  *    version — replays and out-of-order stragglers are dropped. State
  *    is evicted via event-time timeout past the watermark, bounding
  *    the store (keys × state bytes), which is what makes this viable
  *    at 100 TB: state holds ~16 bytes per live key, not payloads.
  *
  *  - `dedupeWithinWatermark`: exact duplicate suppression (same key +
  *    same version) via dropDuplicatesWithinWatermark — the lightweight
  *    path when upstream can redeliver but not reorder.
  */
object StreamCompaction {

  /** Version vector per key: newest (ts_ms, offset) seen. */
  final case class KeyVersion(tsMs: Long, offset: Long)

  def latestPerKeyStateful(events: Dataset[CdcEvent],
                           watermarkDelay: String = "10 minutes"): Dataset[CdcEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", watermarkDelay)
      .as[CdcEvent]
      .groupByKey(e => (e.db_name, e.tb_name, e.pk))
      .flatMapGroupsWithState[KeyVersion, CdcEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, batch, state: GroupState[KeyVersion]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption
            def newer(ats: Long, aoff: Long, bts: Long, boff: Long): Boolean =
              ats > bts || (ats == bts && aoff > boff)
            val best = batch.reduceOption { (a, b) =>
              if (newer(a.ts_ms, a.offset, b.ts_ms, b.offset)) a else b
            }
            val winner = best.filter(e => prev.forall(p =>
              newer(e.ts_ms, e.offset, p.tsMs, p.offset)))
            winner.foreach { e =>
              state.update(KeyVersion(e.ts_ms, e.offset))
              // evict once the watermark passes the key's last activity
              state.setTimeoutTimestamp(e.ts_ms, watermarkDelay)
            }
            winner.iterator
          }
      }
  }

  /** Exact-duplicate suppression keyed on (table, pk, version) within
    * the watermark window.
    */
  def dedupeWithinWatermark(df: DataFrame,
                            watermarkDelay: String = "10 minutes"): DataFrame =
    df.withColumn("event_time", timestamp_millis(col("ts_ms")))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("db_name", "tb_name", "pk", "ts_ms", "offset")

  /** Streaming sessionization — the watermarked stream form of the
    * batch `session_window` aggregate (`q_sessionize`): per-entity
    * gap-based sessions over a live event stream, emitted in Append
    * mode once the watermark passes a session's gap-extended end (a
    * session only FINALIZES when no in-delay event can still extend
    * it). State is one open-session range per (entity, session) in the
    * state store — Spark merges overlapping windows natively — and
    * eviction is watermark-driven, so state is bounded by the number
    * of OPEN sessions, never the stream's history. Same boundary
    * semantics as the batch form (an event at exactly prev + gap still
    * merges), so a closed stream session equals the batch session over
    * the same events — the stream/batch parity the spec pins.
    */
  def sessionizeStream(events: DataFrame, tsCol: String,
                       entityCol: String, gap: String = "30 minutes",
                       watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(entityCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(entityCol), col("n_events"))

  /** A document surviving streaming exact-dedup: first occurrence of its
    * content fingerprint across the whole stream. */
  final case class DedupedDoc(id: Long, fp: String, text: String)

  /** Streaming corpus ingestion with CROSS-BATCH exact dedup: keyed
    * state on the content fingerprint ([[graft.ext.TextOps.fingerprint]]
    * — md5 of normalized text), first occurrence wins (lowest id inside
    * a batch, arrival order across batches), every later duplicate is
    * suppressed no matter how many triggers apart. This is the streaming
    * complement of [[graft.ext.Dedup.exactGroups]] for continuously-
    * arriving training data: state per unique document is ~50 bytes
    * (fingerprint + flag), NOT the text, so a billion-doc corpus holds
    * ~50 GB of state across the cluster — viable where re-running batch
    * dedup per trigger is not. No timeout by default: exact dedup is
    * global by definition; pass a watermark-based variant when the
    * contract is bounded-window dedup.
    */
  /** A document admitted by the streaming quota gate. */
  final case class AdmittedDoc(stratum: String, id: Long)

  /** Streaming per-stratum admission quota: a document is admitted only
    * while its stratum's accepted count is below `quota` — cross-batch
    * state is ONE counter per stratum (bytes per source/language, not
    * per doc). The arrival-order complement of [[graft.ext.Corpus
    * .quotaSample]]: a batch job picks the hash-min rows after seeing
    * everything; a stream must decide at arrival. Within a trigger,
    * admission is deterministic (lowest ids first).
    */
  def quotaAdmit(docs: DataFrame, strataCol: String, idCol: String,
                 quota: Int): Dataset[AdmittedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(strataCol).cast("string").as("stratum"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, AdmittedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (stratum, rows, state: GroupState[Long]) =>
          val accepted = state.getOption.getOrElse(0L)
          val room = math.max(0L, quota - accepted).toInt
          val admitted = rows.map(_._2).toArray.sorted.take(room)
          if (admitted.nonEmpty) state.update(accepted + admitted.length)
          admitted.iterator.map(AdmittedDoc(stratum, _))
      }
  }

  /** Running KMV distinct estimate per group — the streaming form of
    * [[graft.ext.Sketch.kmvDistinct]]. State per group is the k-long
    * bottom-k buffer (mergeable by construction), so the estimate after
    * any number of triggers equals the batch sketch over the union of
    * all data seen — asserted in the spec, and the property that lets a
    * day-long stream and a backfill agree. Emits one row per group per
    * trigger (Update mode); the row with the highest `n_values` is the
    * current estimate.
    */
  final case class DistinctEstimate(group: String, n_values: Long,
                                    est_distinct: Long)

  def kmvDistinctStream(df: DataFrame, groupCol: String, valueCol: String,
                        k: Int): Dataset[DistinctEstimate] = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    df.select(col(groupCol).cast("string").as("g"),
        graft.ext.TextOps.portableHash(col(valueCol).cast("string")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Array[Long]), DistinctEstimate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, rows, state: GroupState[(Long, Array[Long])]) =>
          val (seen, prev) = state.getOption.getOrElse((0L, Array.empty[Long]))
          val buf = new graft.functions.KmvBuffer(k)
          prev.foreach(buf.add)
          var n = seen
          rows.foreach { r => buf.add(r._2); n += 1 }
          val bottom = java.util.Arrays.copyOfRange(buf.arr, 0, buf.n)
          state.update((n, bottom))
          Iterator.single(DistinctEstimate(g, n,
            graft.ext.Sketch.estimate(bottom, k)))
      }
  }

  def firstPerFingerprint(docs: DataFrame, idCol: String,
                          textCol: String): Dataset[DedupedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        graft.ext.TextOps.fingerprint(col(textCol)).as("fp"),
        col(idCol).cast("long").as("id"),
        col(textCol).as("text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, DedupedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (fp, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(_._2)
            Iterator.single(DedupedDoc(first._2, fp, first._3))
          }
      }
  }

  /** Streaming URL-FIRST-SEEN dedup — the crawl-frontier form of
    * [[firstPerFingerprint]], and the streaming half of the r14 URL
    * rung ([[graft.ext.Dedup.urlGroups]] is the batch half): state is
    * keyed on the CANONICAL URL ([[graft.ext.TextOps.canonicalUrl]]),
    * so the first crawl of a page is emitted and every later crawl —
    * under ANY of the syntactic variants the canonicalizer collapses
    * (scheme/case/port/tracking/fragment/slash) — is dropped before it
    * costs a content pass. Within one batch the minimum id wins
    * (deterministic replay, the [[firstPerFingerprint]] convention).
    *
    * State: one boolean per distinct canonical URL (key ≈ the URL
    * string); the state store shards on the canonical key, so a
    * 10¹⁰-page frontier scales horizontally like any keyed state.
    *
    * @return one row per first-seen page: (id, url_key, url — the
    *         ORIGINAL form that won, for the fetch log)
    */
  def firstPerCanonicalUrl(docs: DataFrame, idCol: String,
                           urlCol: String): Dataset[DedupedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        graft.ext.TextOps.canonicalUrl(col(urlCol)).as("fp"),
        col(idCol).cast("long").as("id"),
        col(urlCol).as("text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, DedupedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(_._2)
            Iterator.single(DedupedDoc(first._2, key, first._3))
          }
      }
  }
}
