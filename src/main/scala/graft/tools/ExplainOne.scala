package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps the `.explain("formatted")` output of the named declared
  * queries to individual files — the per-query before/after plan
  * evidence the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: runMain graft.tools.ExplainOne <outDir> <suffix> <name>...
  * writes `<outDir>/<name>_<suffix>.txt` per query.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainOne <outDir> <suffix> <name>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions8
    args.drop(2).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val txt =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Exception => s"PLAN BUILD FAILED: ${e.getMessage}" }
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[explain] wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
  private def Sessions8 = graft.Sessions.local("8")
}
