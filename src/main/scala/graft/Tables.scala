package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take a scale-factor directory so the same code runs at
  * sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, at real
  * scale, any parquet layout: the reads are plain `spark.read.parquet`
  * so Catalyst handles column pruning and filter pushdown into the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` normalization — the fixture's encoding has varied
    * across driver generations and none of the query code should care:
    *  - TIMESTAMP(NANOS) parquet (early rounds): Spark's reader rejects
    *    it outright; Sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions]]),
    *    so the column arrives as nanos-since-epoch LongType — convert
    *    with integer division (no double round-trip — 2^62 ns doesn't
    *    fit a double mantissa);
    *  - TIMESTAMP(MICROS) with isAdjustedToUTC=false (round-10
    *    regeneration): Spark 4 infers TIMESTAMP_NTZ, which
    *    `unix_millis`/`to_utc_timestamp` & friends reject. The stored
    *    values are UTC wall times and the session timezone is pinned
    *    UTC, so the cast to the instant type is an identity on the
    *    stored micros (and matches DuckDB's naive `epoch_ms` read).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
