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

  /** Bin-pack a parquet directory into ~`targetBytes` files — the
    * small-files fix. Streaming ingestion and per-table fanout produce
    * thousands of KB-sized files per partition; at 100 TB that means
    * listing/opening costs dominate scans and the NameNode/object-store
    * melts. Rewrite: one pass, `ceil(bytes/target)` output files via a
    * round-robin repartition (no key assumption), atomic swap via
    * rename. Run it as the compaction tick of any continuously-written
    * table; readers see either the old or the new file set.
    *
    * @return number of output files written
    */
  def compactParquetDir(spark: org.apache.spark.sql.SparkSession, dir: String,
                        targetBytes: Long = 128L << 20): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(
      path.getParent, s".compact-${path.getName}-${java.util.UUID.randomUUID()}")
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(
      path.getParent, s".old-${path.getName}-${java.util.UUID.randomUUID()}")
    fs.rename(path, old)
    fs.rename(tmp, path)
    fs.delete(old, true)
    nFiles
  }

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * deterministic salt in [0, n); the small side is replicated n ways.
    * The shuffle key becomes (key, salt), splitting each hot key across
    * n reducers. AQE's skew-join handles moderate skew adaptively; this
    * is the explicit tool for pathological keys.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
