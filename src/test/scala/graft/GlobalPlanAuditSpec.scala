package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface physical-plan audit: every declared query — current and
  * FUTURE — is swept for the two unconditional scale-killers, so a new
  * query can't ship one unnoticed (the per-query guards in [[PlanSpec]]
  * pin richer, query-specific properties):
  *
  *  - `CartesianProduct`: never acceptable on unbounded relations, and
  *    the bounded cross-joins this library uses (single-row stats
  *    frames) plan as broadcast joins, so the operator's appearance at
  *    all is a bug;
  *  - `Exchange SinglePartition`: acceptable ONLY when its child
  *    produces boundedly many rows — a partial aggregate (one
  *    accumulator row per upstream partition), a TakeOrdered/limit
  *    (≤ k rows) — because everything below one of those funnels the
  *    full relation through a single task.
  *
  * Building a plan does not run the query, but composite queries do
  * driver-side estimation (centroid seeding, BPE rounds, strata counts)
  * at DataFrame-construction time — the audit costs roughly one
  * Verify-style pass of plan building, not of execution.
  */
class GlobalPlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  // bounded-output producers: a SinglePartition exchange directly above
  // one of these ships partition-count-many (or ≤ k) rows, never the
  // relation
  private val boundedChildren = Seq(
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "TakeOrderedAndProject", "LocalLimit", "CollectLimit")

  test("all declared queries: no CartesianProduct; SinglePartition exchanges bounded") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for (q <- Queries.all) {
      val plan =
        try q.fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Exception =>
          offenders += s"${q.name}: plan build failed: ${e.getMessage}"; "" }
      if (plan.contains("CartesianProduct"))
        offenders += s"${q.name}: CartesianProduct in plan"
      val lines = plan.linesIterator.toVector
      lines.zipWithIndex.foreach { case (l, i) =>
        if (l.contains("Exchange SinglePartition")) {
          // Exchange is unary: in tree print the next line is its child
          val child = lines.lift(i + 1).getOrElse("")
          if (!boundedChildren.exists(child.contains))
            offenders += s"${q.name}: SinglePartition exchange over " +
              s"unbounded child: ${child.trim.take(90)}"
        }
      }
    }
    assert(offenders.isEmpty,
      s"${offenders.size} scale-killer plan shapes:\n${offenders.mkString("\n")}")
  }
}
