package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: violation predicates are evaluated as
  * conditional-count aggregate expressions in ONE scan — no per-check
  * passes, no driver loops — so an audit costs the same as a single
  * aggregate regardless of how many checks it carries.
  */
object DataQuality {

  /** A named expectation; `violation` is true on rows that BREAK it. */
  final case class Check(name: String, violation: Column)

  def notNull(name: String, c: Column): Check = Check(name, c.isNull)
  def inRange(name: String, c: Column, lo: Double, hi: Double): Check =
    Check(name, c.isNull || c < lo || c > hi)
  def matches(name: String, c: Column, pattern: String): Check =
    Check(name, c.isNull || !c.rlike(pattern))

  /** One row: total row count plus one violation-count column per check.
    * Add `uniqueKeyCols` to also count duplicate-key rows (computed as
    * count - approxless exact distinct in the same aggregate).
    */
  def audit(df: DataFrame, checks: Seq[Check],
            uniqueKeyCols: Seq[String] = Nil): DataFrame = {
    val base: Seq[Column] = count(lit(1)).as("n_rows") +:
      checks.map(c => count(when(c.violation, 1)).as(c.name))
    val all = if (uniqueKeyCols.isEmpty) base
      else base :+ (count(lit(1)) -
        countDistinct(uniqueKeyCols.head, uniqueKeyCols.tail: _*)).as("n_dup_key")
    df.agg(all.head, all.tail: _*)
  }
}
