package graft

/** Benchmark main: times every declared query at the given SF and prints
  * ONE JSON line for the driver.
  *
  * Each query runs twice and BOTH times are reported (`cold`/`warm`
  * maps), with `queries` keeping the min of the two for round-over-round
  * continuity. Cold pays one-time costs (whole-stage codegen, JIT,
  * parquet footer reads, the first population of any operator-internal
  * cache); warm is the steady-state throughput. Emitting both keeps the
  * one-time cost visible instead of silently flattered away.
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

    // a query's materializations (operator-internal persists, iteration
    // localCheckpoints) must not pressure the NEXT query's run: the
    // queries share this JVM only in the bench — production jobs get
    // their own. Cache entries are released through the CacheManager
    // (clearCache), checkpoint RDDs directly; after each query, like the
    // driver would.
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val results = Queries.all.map { q =>
      val cold = once(q.fn)
      val warm = once(q.fn)
      release()
      (q.name, cold, warm)
    }
    def jmap(f: ((String, Double, Double)) => Double): String =
      results.map { r => "\"" + r._1 + "\":" + f(r) }.mkString("{", ",", "}")
    def minOr(c: Double, w: Double): Double =
      if (c < 0 || w < 0) -1.0 else math.min(c, w)
    val qs = jmap(r => minOr(r._2, r._3))
    val colds = jmap(_._2)
    val warms = jmap(_._3)
    val failed = results.count(r => minOr(r._2, r._3) < 0)
    val total = results.map(r => minOr(r._2, r._3)).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$colds,"warm":$warms,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
