package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent, engine-portable sketches.
  *
  * Spark's HLL (`approx_count_distinct`) is deterministic but its sketch
  * is implementation-specific — no external engine reproduces it. KMV
  * (k minimum values) over the portable 60-bit md5 hash IS reproducible
  * anywhere: the k-th smallest distinct hash h_k estimates distinct
  * count as (k-1) · 2^60 / h_k (uniform order statistics), and every
  * engine computes the identical integer.
  *
  * Scale shape: ONE aggregation, no distinct pass, no window. The
  * [[graft.functions.KmvBottomK]] buffer holds the k smallest DISTINCT
  * hashes — constant-size and mergeable (union + re-take bottom-k, the
  * property that makes KMV work across partitions/days) — so map-side
  * partials shuffle k longs per group, and parallelism is bounded by
  * the map partitioning, not by group cardinality. (The earlier
  * formulation — distinct + per-group bottom-k window — put each
  * group's whole distinct-hash set through ONE task: with 3 groups it
  * was the slowest bench query on a 32-core box.)
  */
object Sketch {

  private val HashSpace = 1L << 60

  /** The KMV order-statistic estimate from a sorted bottom-k array —
    * shared by the batch aggregate and the streaming state operator
    * (identical integers by construction). */
  def estimate(bottomK: Array[Long], k: Int): Long =
    if (bottomK.length < k) bottomK.length.toLong
    else math.floor((k - 1).toLong * HashSpace.toDouble / bottomK(k - 1)).toLong

  /** Per-group KMV distinct estimate. Exact when the group has fewer
    * than k distinct values (falls back to the true count).
    *
    * @return (groupCols..., est_distinct: long)
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    val bottomK = graft.functions.VectorFunctions.kmvBottomK(
      TextOps.portableHash(col(valueCol).cast("string")), k)
    df.groupBy(groupCols.map(col): _*)
      .agg(bottomK.as("bk"))
      .select((groupCols.map(col) :+
        when(size(col("bk")) < k, size(col("bk")))
          .otherwise(floor(lit((k - 1).toLong * HashSpace.toDouble) /
            element_at(col("bk"), k)).cast("long"))
          .cast("long").as("est_distinct")): _*)
  }
}
