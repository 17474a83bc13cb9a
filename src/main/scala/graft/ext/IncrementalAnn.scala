package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The operational loop for a continuously-growing ANN corpus: each
  * arriving batch of embeddings is near-dup-filtered against the
  * PERSISTENT cell-partitioned IVF index ([[Similarity.writeIvfIndex]]
  * layout) and appended to it — the vector complement of
  * [[IncrementalDedup]]. Designed as a `foreachBatch` body; the caller
  * serializes ticks.
  *
  * Admission semantics per tick (mirrors [[IncrementalDedup]]):
  *  1. in-batch: batch pairs sharing a probed cell with cosine ≥ tau
  *     collapse to the lowest id ([[Dedup.connectedComponents]] over the
  *     pair list);
  *  2. cross-batch: a batch vector within tau of an INDEXED vector in
  *     any of its probed cells is dropped — first arrival wins.
  *
  * Scale posture: a tick's cost is the batch × its probed slice, never
  * the full index. The cross-batch read filters on the batch's distinct
  * probed cell ids — a literal `IN` over the `cell` partition column,
  * so parquet prunes whole cell directories (the same numFiles-proven
  * mechanism as [[Similarity.readIvfProbes]]); the blocked join then
  * pairs only same-cell candidates and the codegen'd exact cosine
  * verifies. Recall contract is IVF's: a duplicate hiding in a cell the
  * batch vector does not probe is missed — dial `nProbe` up for recall,
  * exactly as in search.
  */
object IncrementalAnn {

  /** One admission tick. Returns (admitted, droppedInBatch,
    * droppedVsIndex); appends survivors to `indexDir` partitioned by
    * their nearest-centroid cell (created on first use).
    *
    * @param cents coarse centroids (id, vector) — FIXED across ticks;
    *              retrain + rewrite the index offline when drift
    *              accumulates
    * @param tau   cosine threshold at/above which a vector is a
    *              duplicate
    * @param nProbe cells each batch vector is checked against
    */
  def admitBatch(batch: DataFrame, idCol: String, vecCol: String,
                 indexDir: String, cents: Array[(Long, Array[Float])],
                 tau: Double, nProbe: Int): (Long, Long, Long) = {
    val spark = batch.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val fns = graft.functions.VectorFunctions
    val n = batch.count()
    // (id, emb, cell[]) — probed cells ride the batch; consumed by the
    // in-batch self-join, the index join, and the final append
    val probed = Materialize.multiScan(
      batch.select(col(idCol).as("id"), col(vecCol).as("emb"))
        .withColumn("cells", fns.probeCentroids(col("emb"), cents, nProbe)))
    val exploded = probed.select(col("id"), col("emb"),
      explode(col("cells")).as("cell"))
    // 1. in-batch collapse: same probed cell + exact cosine >= tau
    val a = exploded.select(col("id").as("id_a"), col("emb").as("emb_a"), col("cell"))
    val b = exploded.select(col("id").as("id_b"), col("emb").as("emb_b"), col("cell"))
    val inBatchPairs = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b") &&
        fns.cosineSim(col("emb_a"), col("emb_b")) >= tau)
      .select(col("id_a"), col("id_b")).distinct()
    val inBatchDrops = Dedup.connectedComponents(inBatchPairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id"))
    // 2. cross-batch: probe the indexed cells this batch touches (the
    // literal IN prunes whole cell directories at the parquet source)
    val vsIndexDrops = indexIfExists(spark, indexDir) match {
      case Some(index) =>
        val touched = probed.select(explode(col("cells")).as("cell"))
          .distinct().collect().map(_.getLong(0)) // bounded by nCentroids
        exploded.join(
            index.filter(col("cell").isin(touched.toIndexedSeq: _*))
              .select(col("cell"), col("emb").as("idx_emb")),
            Seq("cell"))
          .filter(fns.cosineSim(col("emb"), col("idx_emb")) >= tau)
          .select(col("id")).distinct()
      case None => inBatchDrops.limit(0)
    }
    val dropIds = Materialize.multiScan(
      inBatchDrops.unionByName(vsIndexDrops).distinct())
    // count ACTUAL admitted rows (not n minus drop ids): with
    // non-unique batch ids the two differ, and the written rows are
    // what the caller's accounting must track (IncrementalDedup's
    // contract). The stored cell is the probe list's own best cell —
    // cells are ordered best-first, so element 1 is the nearest
    // centroid under the SAME (cosine desc, id asc) tie-break the
    // lookup side uses; re-scoring with a separate argmax expression
    // could file a tie differently than search probes it
    val admitted = Materialize.multiScan(
      probed.join(dropIds, Seq("id"), "left_anti")
        .select(col("id"), col("emb"), element_at(col("cells"), 1).as("cell")))
    val nAdmitted = admitted.count()
    if (nAdmitted > 0)
      admitted.write.partitionBy("cell").mode(SaveMode.Append).parquet(indexDir)
    val nInBatch = inBatchDrops.count()
    Seq(probed, dropIds, admitted).foreach(_.unpersist())
    (nAdmitted, nInBatch, n - nAdmitted - nInBatch)
  }

  private def indexIfExists(spark: SparkSession,
                            indexDir: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) Some(spark.read.parquet(indexDir)) else None
  }

  /** Periodic index maintenance, cell-aware: each `cell=N` partition
    * directory is a flat parquet directory, bin-packed independently
    * ([[Layout.compactParquetDir]]) so the partition column (borne by
    * the directory name) survives and partition pruning is untouched.
    * Every tick appends ≥1 file into each cell it admits to, so
    * unattended growth is linear in ticks × touched cells. Call every N
    * ticks INSIDE the loop's serialized window (`foreachBatch` body on
    * `batchId % N == N - 1`) — the compaction contract requires no
    * concurrent writer/reader, which the loop's serialization provides.
    * Returns total part files across cells after packing.
    */
  def maintain(spark: SparkSession, indexDir: String,
               targetBytes: Long = 128L << 20): Int = {
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0
    else fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .map(d => Layout.compactParquetDir(spark, d.getPath.toString, targetBytes))
      .sum
  }
}
