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

  /** Portable Count-Min sketch grid over an item column: `depth` hash
    * rows × `width` counters, row i addressing each item by the portable
    * 60-bit md5 hash of `item + "#" + i` mod width. A point query reads
    * one cell per row and takes the minimum ([[cmsEstimate]]) — always
    * ≥ the true count, overshooting by more than 2N/width with
    * probability at most 2^-depth (Cormode & Muthukrishnan 2005).
    *
    * Scale shape: the grid is an ordinary (row, bucket) count aggregate,
    * so map-side partials bound the shuffle at partitions × depth × width
    * rows no matter how many distinct items exist (the frequency cousin
    * of [[kmvDistinct]]'s bounded buffer), and grids built over disjoint
    * slices merge by cell-wise addition — the property that lets a
    * per-day / per-partition build compose into the corpus sketch. Every
    * cell is a deterministic function of the md5 hash, so any engine
    * reproduces the identical grid.
    *
    * @return (d: int, bucket: long, c: long) — only touched cells appear;
    *         absent cells are zero
    */
  def cmsCells(items: DataFrame, itemCol: String, depth: Int,
               width: Int): DataFrame = {
    graft.functions.VectorFunctions.register(items.sparkSession)
    items
      .select(col(itemCol).cast("string").as("__it"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("d"), cmsBucket(col("__it"), col("d"), width).as("bucket"))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  private def cmsBucket(item: org.apache.spark.sql.Column,
                        d: org.apache.spark.sql.Column, width: Int) =
    pmod(TextOps.portableHash(concat(item, lit("#"), d.cast("string"))),
      lit(width.toLong))

  /** CMS point estimates: for each probe row, est = min over the grid's
    * depth rows of the addressed cell. The grid (≤ depth × width rows
    * after aggregation — a few KB at any corpus scale) broadcasts, so
    * probing is a map-side join: no shuffle touches the probe relation.
    *
    * The join is LEFT so a probe addressing an untouched cell reads it
    * as 0 — exactly the true CMS semantics, where the min ranges over
    * all depth cells including zeros. An out-of-corpus probe (the
    * decontamination-lookup case) therefore returns cms_n = 0 instead
    * of overestimating from the subset of its cells that happen to
    * collide with corpus items, and never vanishes from the output.
    *
    * @return probes' columns + (cms_n: long)
    */
  def cmsEstimate(items: DataFrame, itemCol: String, probes: DataFrame,
                  probeCol: String, depth: Int, width: Int): DataFrame = {
    val cells = cmsCells(items, itemCol, depth, width)
    val keep = probes.columns.toIndexedSeq.map(col)
    probes
      .select(keep :+ explode(sequence(lit(0), lit(depth - 1))).as("d"): _*)
      .withColumn("bucket",
        cmsBucket(col(probeCol).cast("string"), col("d"), width))
      .join(broadcast(cells), Seq("d", "bucket"), "left")
      .groupBy(keep: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_n"))
  }
}
