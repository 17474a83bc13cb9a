package graft.tools

/** Driver-side plan cost of a declared query: time to BUILD the
  * DataFrame (analysis) and to force `executedPlan` (optimization +
  * physical planning), without executing a single task — the §7.3
  * "is the driver the bottleneck" lens for composite queries whose
  * physical plans run to thousands of lines. Prints build/plan/exec
  * wall per run so the plan share of a warm run is a number, not a
  * guess.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.PlanTime <query> [runs]
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanTime <query> [runs]")
    val name = args(0)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val fn = graft.SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sf)
      val t1 = System.nanoTime()
      val plan = df.queryExecution.executedPlan
      val nNodes = plan.collectLeaves().size
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      println(f"[plantime] $name run $i: build=${(t1 - t0) / 1e9}%.3fs " +
        f"plan=${(t2 - t1) / 1e9}%.3fs exec=${(t3 - t2) / 1e9}%.3fs " +
        f"leaves=$nNodes")
    }
    spark.stop()
  }
}
