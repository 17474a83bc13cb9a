package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank / prefix-sum.
  *
  * `Window.orderBy(...)` with no `partitionBy` funnels the ENTIRE relation
  * through one task — the classic single-partition scale-killer: at 100 TB
  * it is one executor core processing everything. These helpers compute
  * the same total-order quantities with full parallelism via the
  * textbook two-pass scheme:
  *
  *   1. range-repartition on the order keys (Spark's `RangePartitioner`,
  *      sampled boundaries — partition i holds a contiguous key range and
  *      partitions are themselves ordered);
  *   2. rank / running-sum WITHIN each partition (a window partitioned by
  *      the partition id — every partition is an independent task);
  *   3. collect the per-partition subtotals to the driver (one long per
  *      partition — tiny at any scale) and broadcast the exclusive
  *      prefix of those subtotals back as each partition's offset.
  *
  * The result is identical to the single-partition window for any range
  * partitioning, because the quantities depend only on the total order of
  * the keys, not on where the boundaries fall. Rows that compare equal on
  * the order keys land in the same range partition, so ties behave
  * exactly as in the single-window formulation — which also means the
  * order should END IN A UNIQUE TIEBREAKER (callers use the row id):
  * a low-cardinality key alone caps parallelism at its distinct count,
  * since each key's rows cannot be split across range partitions.
  *
  * The ranged projection is persisted ([[Materialize.multiScan]]) so the
  * subtotal pass and the main pass read the same materialized
  * partitioning (and the range exchange runs once, not twice). A cache
  * eviction between the passes is safe: recompute replays the SAME
  * shuffle dependency (the `RangePartitioner`'s sampled boundaries are
  * fixed when the dependency is created), so `__pid` is stable.
  */
object Prefix {

  /** `df` plus column `out` = global `row_number()` over `order`. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    core(df, order, None, out)

  /** `df` plus column `out` = global running sum of `value` (rows from the
    * start of the order through the current row, inclusive).
    */
  def globalRunningSum(df: DataFrame, order: Seq[Column], value: Column,
                       out: String): DataFrame =
    core(df, order, Some(value), out)

  private def core(df: DataFrame, order: Seq[Column], value: Option[Column],
                   out: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = value.fold(df)(v => df.withColumn("__v", v))
    // the nondeterministic-flagged spark_partition_id is bound as a real
    // attribute in a projection (legal), then grouped/windowed BY attribute
    val ranged = Materialize.multiScan(
      base.repartitionByRange(order: _*)
        .withColumn("__pid", spark_partition_id()))
    // subtotals stay in the value's numeric family: integral sums (and
    // row counts) in long, fractional sums in double — a long cast here
    // would silently truncate fractional running sums. (Decimal values
    // ride the double path; use an integral/double column where exact
    // decimal semantics matter.)
    val fractional = value.isDefined && (base.schema("__v").dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType |
           (_: org.apache.spark.sql.types.DecimalType) => true
      case _ => false
    })
    val subCast = if (fractional) "double" else "long"
    val subAgg = value.fold(count(lit(1)))(_ => sum(col("__v")))
    val subRows = ranged.groupBy(col("__pid"))
      .agg(subAgg.cast(subCast).as("__sub")).collect()
    val nParts = if (subRows.isEmpty) 0 else subRows.map(_.getInt(0)).max + 1
    // offsets(p) = sum of subtotals of all partitions before p —
    // accumulated in the value's own type (long stays exact past 2^53)
    val offDf =
      if (fractional) {
        val subs = subRows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
        (0 until nParts).scanLeft(0.0)((acc, p) => acc + subs.getOrElse(p, 0.0))
          .take(math.max(nParts, 1))
          .zipWithIndex.map { case (o, p) => (p, o) }.toDF("__pid", "__off")
      } else {
        val subs = subRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
        (0 until nParts).scanLeft(0L)((acc, p) => acc + subs.getOrElse(p, 0L))
          .take(math.max(nParts, 1))
          .zipWithIndex.map { case (o, p) => (p, o) }.toDF("__pid", "__off")
      }
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val local = value.fold(row_number().over(w).cast("long"))(_ =>
      sum(col("__v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranged.join(broadcast(offDf), Seq("__pid"))
      .withColumn(out, local + col("__off"))
      .drop("__pid", "__off", "__v")
  }
}
