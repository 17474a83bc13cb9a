package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling.
  *
  * Media payloads are opaque `binary` columns accompanied by a typed
  * metadata struct — the parquet-native pattern for multimodal training
  * data (media bytes inline or as object-store pointers; Spark never
  * interprets them). Decode / resize / frame-sample run as batched
  * per-partition transforms; the codec call itself is STUBBED here
  * (`decodeStub`) because media libraries are not available in this
  * environment — the Spark-side plumbing (schema, batching,
  * partitioning) is real and tested.
  */
object Multimodal {

  /** Typed record for the per-partition decode path. */
  final case class MediaRow(media_id: Long, content: Array[Byte], kind: String)
  final case class DecodedRow(media_id: Long, kind: String, n_bytes: Int,
                              sha: String, width: Int, height: Int, n_frames: Int)

  /** Wrap a string column as a media binary column + metadata struct:
    * the ingestion step for corpora where media arrives base64/raw.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        lit(kind).as("kind"),
        length(col(payloadCol).cast("binary")).as("n_bytes"),
        md5(col(payloadCol).cast("binary")).as("checksum")).as("media_meta"))

  /** Deterministic fake "decode": derives plausible media dimensions from
    * the content hash/length. This is the STUB for the real codec —
    * replace the arithmetic with an actual decoder behind the same
    * signature. Pure column expressions ⇒ oracle-checkable.
    */
  def fakeDecodeMeta(content: Column): Column = {
    val n = length(content)
    struct(
      (lit(64) + pmod(n, lit(512))).as("width"),
      (lit(64) + pmod(n * 7, lit(512))).as("height"),
      (lit(1) + pmod(n, lit(16))).as("n_frames"))
  }

  /** Frame sampling: explode a media row into every `step`-th frame row
    * (1-indexed), with a deterministic per-frame fingerprint — the shape
    * of video-to-training-examples extraction. The per-frame "feature"
    * is STUBBED (md5 of content + frame index standing in for a decoded
    * frame embedding); the relational shape — lateral explode of a
    * frame sequence bounded by decoded metadata, one output row per
    * sampled frame — is the real, scalable part: no driver round-trip,
    * generates rows inside the scan's codegen stage.
    */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    media
      .withColumn("n_frames", fakeDecodeMeta(col("content")).getField("n_frames"))
      .select(col("media_id"), col("n_frames"),
        col("media_meta.checksum").as("checksum"),
        explode(sequence(lit(1), col("n_frames"), lit(step))).as("frame_no"))
      .select(col("media_id"), col("n_frames"), col("frame_no"),
        md5(concat(col("checksum"), lit(":"), col("frame_no").cast("string")))
          .as("frame_fp"))

  /** Batched per-partition decode, the `mapInPandas` analogue in Scala:
    * one iterator pass per partition, records processed in order, codec
    * state (the expensive part in a real decoder) initialized once per
    * partition rather than once per row.
    */
  def decodeStub(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // real impl: initialize codec context here, once per partition
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        digest.reset()
        val sha = digest.digest(r.content).map("%02x".format(_)).mkString
        val n = r.content.length
        // STUB: replace with actual decode; dimensions derived from size
        DecodedRow(r.media_id, r.kind, n, sha,
          64 + n % 512, 64 + (n * 7) % 512, 1 + n % 16)
      }
    }
  }
}
