package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * Scale shape: one distinct-aggregate on (group, hash) — map-side
  * partials collapse duplicates — then a per-group bottom-k, which
  * `WindowGroupLimit` prunes before the sort. The sketch itself (k
  * hashes per group) is tiny and mergeable (union + re-take bottom-k),
  * the property that makes KMV work across partitions/days.
  */
object Sketch {

  private val HashSpace = 1L << 60

  /** Per-group KMV distinct estimate. Exact when the group has fewer
    * than k distinct values (falls back to the true count).
    *
    * @return (groupCols..., est_distinct: long)
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    val hashed = df.select((groupCols.map(col) :+
      TextOps.portableHash(col(valueCol).cast("string")).as("h")): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("h").asc)
    val ranked = hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    ranked.groupBy(groupCols.map(col): _*)
      .agg(max(col("rn")).as("n_seen"), max(col("h")).as("h_k"))
      .select((groupCols.map(col) :+
        when(col("n_seen") < k, col("n_seen"))
          .otherwise(floor(lit((k - 1).toLong * HashSpace.toDouble) / col("h_k")).cast("long"))
          .cast("long").as("est_distinct")): _*)
  }
}
