package graft.config

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Job configuration mirroring the reference's S3-JSON contract
  * (reference readme.md:11-45 + src/glue_dms_redshift_cdc.py:63-69).
  * Field names keep the reference's snake/camel mix so existing config
  * files parse unchanged.
  */
final case class RedshiftConf(
    url: String,
    database: String,
    schema: String,
    user: String,
    password: String,
    tmpdir: Option[String] = None,
    aws_iam_role: Option[String] = None)

final case class MskConf(
    brokers: String,
    topic: String,
    maxOffsetsPerTrigger: Option[Long] = None,
    groupId: Option[String] = None,
    startingOffsets: String = "earliest",
    pollTimeoutMs: Option[Long] = None)

final case class SparkBatchConf(
    windowSize: String = "30 seconds",
    checkpointLocation: String)

final case class SparkConfKnobs(
    dynamicAllocationEnabled: Option[String] = None,
    executorMemory: Option[String] = None,
    executorCores: Option[Int] = None,
    shufflePartitions: Option[Int] = None,
    defaultParallelism: Option[Int] = None,
    speculation: Option[String] = None)

final case class JobConfig(
    redshift_conf: RedshiftConf,
    msk_conf: MskConf,
    spark_batch_conf: SparkBatchConf,
    spark_conf: Option[SparkConfKnobs] = None,
    // DMS-only extras (src/glue_dms_redshift_cdc.py:36-38,63-69)
    record_id_key: String = "id",
    apply_delete: Boolean = true,
    cdc_timestamp_format: String = "yyyy-MM-dd'T'HH:mm:ss'Z'")

object JobConfig {
  private implicit val formats: Formats = DefaultFormats

  /** Parse the job-config JSON. The reference exits when the config is
    * absent (src/glue_pg_redshift_cdc.py:63-65); we surface a typed error.
    */
  def fromJson(json: String): JobConfig =
    JsonMethods.parse(json).extract[JobConfig]

  def fromFile(path: String): JobConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
