package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** BoundedLevenshteinRule: injected optimizer rewrite of
  * `levenshtein(a,b) <= k` into the thresholded banded-DP form.
  *
  * Plan assertions run over a parquet scan — on a LocalRelation,
  * ConvertToLocalRelation folds the whole filter away before anything
  * is observable. Value assertions use local data: both forms must be
  * semantically identical whichever one evaluates.
  */
class RuleSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def part = Tables.part(spark, "/root/testdata/sf0.001")

  private val local = Seq(
    ("kitten", "sitting"), // dist 3
    ("flaw", "lawn"),      // dist 2
    ("abc", "abc"),        // dist 0
    ("abcdefgh", "zyxwvuts")). // dist 8
    toDF("a", "b")

  test("bounded comparisons rewrite to the thresholded form") {
    val q = part.filter(levenshtein(col("p_name"), lit("small ring")) <= 3)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("Some(3)) >= 0"),
      s"expected thresholded rewrite in:\n$optimized")
    assert(local.filter(levenshtein(col("a"), col("b")) <= 3)
      .select("a").as[String].collect().toSet == Set("kitten", "flaw", "abc"))
  }

  test("strict < and reversed comparisons rewrite with adjusted bounds") {
    val lt = part.filter(levenshtein(col("p_name"), lit("small ring")) < 3)
    assert(lt.queryExecution.optimizedPlan.toString.contains("Some(2)) >= 0"))
    val rev = part.filter(lit(3) >= levenshtein(col("p_name"), lit("small ring")))
    assert(rev.queryExecution.optimizedPlan.toString.contains("Some(3)) >= 0"))
    assert(local.filter(levenshtein(col("a"), col("b")) < 3)
      .select("a").as[String].collect().toSet == Set("flaw", "abc"))
    assert(local.filter(lit(3) >= levenshtein(col("a"), col("b"))).count() == 3)
  }

  test("unbounded uses and lower-bound comparisons are left alone") {
    val proj = part.select(levenshtein(col("p_name"), lit("small ring")).as("d"))
    assert(!proj.queryExecution.optimizedPlan.toString.contains(") >= 0"))
    val ge = part.filter(levenshtein(col("p_name"), lit("small ring")) >= 3)
    assert(!ge.queryExecution.optimizedPlan.toString.contains(") >= 0"))
    assert(local.select(levenshtein(col("a"), col("b")).as("d"))
      .as[Int].collect().sorted.toSeq == Seq(0, 2, 3, 8))
  }
}
