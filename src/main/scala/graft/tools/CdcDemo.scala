package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.envelope.PgCdc
import graft.pipeline.CdcPipeline
import graft.sink.ParquetMergeSink

/** Runnable end-to-end demo of the CDC replication pipeline: synthesizes
  * a Debezium-PG envelope stream from the `events` test table, replays
  * it through the streaming pipeline in two micro-batches, and prints
  * the final merged per-table state.
  *
  * Usage: runMain graft.tools.CdcDemo [sfDir] [sinkDir]
  */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sinkDir = args.lift(1).getOrElse(
      Files.createTempDirectory("graft_cdc_demo").toString)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    // events → Debezium-PG envelope JSON ('error' events become deletes)
    val ev = Tables.events(spark, sfDir)
    val payload = to_json(struct(col("user_id").as("id"),
      col("value").as("v"), col("props").as("props")))
    val envelopes = ev.select(to_json(struct(
      when(col("event_type") =!= "error", payload).as("after"),
      when(col("event_type") === "error", payload).as("before"),
      struct(unix_millis(col("ts")).as("ts_ms"), lit("appdb").as("db"),
        col("event_type").as("table")).as("source"),
      when(col("event_type") === "error", lit("d")).otherwise(lit("u")).as("op"),
      unix_millis(col("ts")).as("ts_ms"))).as("value"),
      col("event_id").as("offset"))

    val sink = new ParquetMergeSink(sinkDir)
    val pipeline = new CdcPipeline(PgCdc, sink, tableParallelism = 8,
      tiebreaker = Some("offset"))

    // replay as two micro-batches split on time, like a restarted stream
    val cut = ev.agg(expr("percentile(event_id, 0.5)")).head().getDouble(0)
    pipeline.processBatch(envelopes.filter(col("offset") <= cut), 0L)
    pipeline.processBatch(envelopes.filter(col("offset") > cut), 1L)

    val tables = new java.io.File(s"$sinkDir/appdb").listFiles().map(_.getName).sorted
    println(s"[cdc-demo] sink=$sinkDir tables=${tables.mkString(",")}")
    tables.foreach { tb =>
      val df = spark.read.parquet(s"$sinkDir/appdb/$tb")
      val n = df.count()
      val sample = if (n > 0) df.select("pk").orderBy("pk").head().getString(0) else "-"
      println(s"[cdc-demo] $tb rows=$n sample_pk=$sample")
    }
    // invariant: merged state == latest-per-user non-delete, computed directly
    val expected = ev.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"), col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the 'error' table receives only deletes → empty state; drop zeros
    val got = tables.map(tb =>
      tb -> spark.read.parquet(s"$sinkDir/appdb/$tb").count()).filter(_._2 > 0).toMap
    println(s"[cdc-demo] expected=$expected got=$got " +
      (if (expected == got) "MATCH" else "MISMATCH"))
    spark.stop()
  }
}
