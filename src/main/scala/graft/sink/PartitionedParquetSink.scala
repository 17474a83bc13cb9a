package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partition-pruned parquet merge sink: target state lives at
  * `<root>/<db>/<tb>/<partitionCol>=<value>/`, and a batch rewrites ONLY
  * the partitions it touches — untouched partitions are never read or
  * written. With a date partition column (the pipeline's `ts_date`), a
  * CDC batch carrying a few recent days leaves years of history alone:
  * merge cost is O(touched partitions), not O(table). This is the
  * file-based analogue of a transactional table format's partition-level
  * rewrite, with the same broadcast anti-join merge shape as
  * [[ParquetMergeSink]] inside each partition.
  *
  * Late data is handled naturally: an old `ts_date` in the batch simply
  * makes that one partition join the touched set.
  */
final class PartitionedParquetSink(rootDir: String,
                                   partitionCol: String = "ts_date")
    extends MergeSink {

  def targetPath(db: String, tb: String) = s"$rootDir/$db/$tb"
  def partitionPath(db: String, tb: String, value: String) =
    s"${targetPath(db, tb)}/$partitionCol=$value"

  def merge(db: String, tb: String, batch: DataFrame,
            keyCol: String, opCol: String, deleteMarker: String): Unit = {
    val spark = batch.sparkSession
    val fs = new Path(rootDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val touched = batch.select(col(partitionCol).cast("string"))
      .distinct().collect().map(_.getString(0))
    touched.foreach { value =>
      val slice = batch.filter(col(partitionCol).cast("string") === value)
      // the directory name carries the partition value; keeping the
      // column in the files too would collide with partition discovery
      val inserts = slice.filter(col(opCol) =!= deleteMarker)
        .drop(opCol, partitionCol)
      val dir = new Path(partitionPath(db, tb, value))
      val next =
        if (fs.exists(dir)) {
          // direct dir read: no discovery, files don't carry partitionCol
          val current = spark.read.parquet(dir.toString)
          current.join(broadcast(slice.select(col(keyCol))), Seq(keyCol), "left_anti")
            .unionByName(inserts)
        } else inserts
      val tmp = new Path(s"$rootDir/.tmp/${db}_${tb}_$value")
      next.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      if (fs.exists(dir)) fs.delete(dir, true)
      fs.mkdirs(dir.getParent)
      fs.rename(tmp, dir)
    }
  }

  /** Read the full table (all partitions) back. */
  def read(db: String, tb: String): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.read.parquet(targetPath(db, tb))
  }
}
