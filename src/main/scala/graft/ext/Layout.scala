package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB posture: bucketing for
  * shuffle-free co-located joins, and salting for skewed keys.
  */
object Layout {

  /** Write a table bucketed+sorted by its join keys. Two tables bucketed
    * the same way join with ZERO exchange — the join cost at 100 TB is
    * then pure scan, which is the difference between minutes and hours.
    * (Parquet + Spark bucketing; on a real deployment the same call
    * targets the metastore.)
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * deterministic salt in [0, n); the small side is replicated n ways.
    * The shuffle key becomes (key, salt), splitting each hot key across
    * n reducers. AQE's skew-join handles moderate skew adaptively; this
    * is the explicit tool for pathological keys.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
