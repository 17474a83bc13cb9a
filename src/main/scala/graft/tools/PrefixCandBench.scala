package graft.tools

import org.apache.spark.sql.functions._

/** Candidate-generation measurement for the two exact-Jaccard routes on
  * the REAL documents fixture (ScaleBench's synthetic corpus is
  * hash-random — near-uniform shingle frequencies, so prefix filtering
  * has nothing to prune there; real text does): distinct candidate
  * pairs entering verification per route, plus warm walls.
  *
  * Run: `sbt "runMain graft.tools.PrefixCandBench [sfDir ...]"`
  * (default sf0.01 and sf0.1).
  */
object PrefixCandBench {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors())))
    println("| sf dir | docs | full cands | prefix cands | true pairs | full warm s | prefix warm s |")
    println("|---|---|---|---|---|---|---|")
    for (dir <- dirs) {
      val docs = graft.Tables.documents(spark, dir)
      val n = docs.count()
      val (full, pref) = graft.ext.Dedup.jaccardCandidateCounts(
        docs, "doc_id", "text", n = 3, tau = 0.25)
      def time(f: => Long): (Double, Long) = {
        f // warmup
        val t0 = System.nanoTime(); val rows = f
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (wFull, truePairs) = time(graft.ext.Dedup.jaccardPairs(
        docs, "doc_id", "text", n = 3, tau = 0.25)
        .queryExecution.toRdd.count())
      val (wPref, truePref) = time(graft.ext.Dedup.jaccardPairsPrefix(
        docs, "doc_id", "text", n = 3, tau = 0.25)
        .queryExecution.toRdd.count())
      require(truePref == truePairs, s"routes disagree: $truePairs vs $truePref")
      println(f"| $dir | $n | $full | $pref | $truePairs | $wFull%.2f | $wPref%.2f |")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }
}
