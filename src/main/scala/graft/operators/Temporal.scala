package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal relational operators Spark lacks as builtins: as-of join and
  * SCD2 (validity-interval) reconstruction.
  *
  * Both are single-shuffle formulations. The naive as-of join is a range
  * join (`l.k = r.k AND r.t <= l.t` + argmax), which Catalyst executes as
  * an equi-join with a range filter and a per-pair blowup before the
  * argmax prunes; at 100 TB the intermediate is quadratic per key. The
  * union+carry-forward trick below shuffles each side ONCE on the key,
  * sorts within partitions, and resolves the match with a running
  * `last(_, ignoreNulls)` window — linear in the input, no pair blowup,
  * and AQE's skew split still applies to the single exchange.
  */
object Temporal {

  /** For each left row, attach the most recent right row at-or-before the
    * left row's time, matched on `keys`.
    *
    * Right rows must be unique per (keys, rightTime): pre-compact ties
    * (e.g. with [[graft.compact.Compaction.latestPerKey]]) so "the" most
    * recent right row is well-defined — same contract as DuckDB/Pandas
    * ASOF joins, which are nondeterministic under ties.
    *
    * Inner semantics: left rows with no preceding right row are dropped.
    *
    * @param carry right columns to attach, renamed `prefix + name`
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, carry: Seq[String],
           prefix: String = "r_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(left(_)): _*)
    val l2 = left.select(keys.map(col) ++ Seq(
      col(leftTime).as("__t"), lit(1).as("__src"), lStruct.as("__l")): _*)
      .withColumn("__carry", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          carry.map(c => org.apache.spark.sql.types.StructField(c,
            right.schema(c).dataType, nullable = true)))))
    val r2 = right.select(keys.map(col) ++ Seq(
      col(rightTime).as("__t"), lit(0).as("__src"),
      lit(null).cast(l2.schema("__l").dataType).as("__l"),
      struct(carry.map(col): _*).as("__carry")): _*)
    // right (__src=0) sorts before left (__src=1) at equal times: a right
    // row AT the left row's time is visible — at-or-before semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__m", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1 && col("__m").isNotNull)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        carry.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }

  /** SCD2 reconstruction: turn a change-event stream into validity
    * intervals. Each event's interval runs from its own time to the next
    * event's time for the same key (exclusive); the last event per key is
    * open-ended (`valid_to` = `openEndMs`) and flagged current. One
    * shuffle on the key; `lead` resolves the successor within partitions.
    *
    * @param tiebreak column ordering events at equal times (e.g. offset)
    */
  def scd2(events: DataFrame, keys: Seq[String], timeMs: Column,
           tiebreak: Column, openEndMs: Long = 253402300799999L): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeMs.asc, tiebreak.asc)
    events
      .withColumn("valid_from_ms", timeMs)
      .withColumn("valid_to_ms",
        coalesce(lead(timeMs, 1).over(w), lit(openEndMs)))
      .withColumn("is_current",
        when(lead(timeMs, 1).over(w).isNull, lit(1)).otherwise(lit(0)))
  }
}
