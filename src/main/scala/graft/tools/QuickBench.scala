package graft.tools
object QuickBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_pack", "q_vocab", "q_fuzzy_snm", "q_kmv_distinct", "dedup_simhash")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // same honest protocol as Bench: execute the query's OWN plan
      // (toRdd), never a stacked .count() Catalyst can prune into
      def once(): Double = { val t0 = System.nanoTime(); fn(spark, sf).queryExecution.toRdd.count(); (System.nanoTime()-t0)/1e9 }
      val cold = once(); val warm = once()
      // release per-query materializations, as Bench does
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      println(f"QUICKBENCH $n%-18s cold=$cold%6.2f warm=$warm%6.2f")
    }
    spark.stop()
  }
}
