package graft

/** Benchmark main: times every declared query at the given SF and prints
  * ONE JSON line for the driver.
  *
  * Each query runs twice and the faster run is reported: the first
  * execution pays one-time costs (whole-stage codegen compilation, JIT,
  * parquet footer reads) that are noise at any realistic data scale —
  * the steady-state number is the engine's throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors()))
    val spark = Sessions.local(cpus)

    def once(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // a query's materializations (localCheckpoint blocks from the
    // self-join operators) must not pressure the NEXT query's run: 76
    // queries share this JVM only in the bench — production jobs get
    // their own. Released after each query, like the driver would.
    def release(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    val results = Queries.all.map { q =>
      val cold = once(q.fn)
      val warm = once(q.fn)
      release()
      q.name -> (if (warm < 0 || cold < 0) -1.0 else math.min(cold, warm))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
