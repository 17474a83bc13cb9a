package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.{IncrementalDedup, LadderBloom}

/** Isolates the PROBE term the Bloom sidecars exist for — the piece
  * the sf1-eq ladder rows can't show because their per-tick cost is
  * dominated by writes and in-batch work at that corpus size. Here the
  * url-key index is large (millions of keys), the batch small (the
  * steady-state asymmetry: a 100 TB corpus against a per-tick batch),
  * and only the SEEN probe is timed:
  *
  *  - plain: batch keys semi-join the stored index — the index is
  *    scanned AND shuffled every tick;
  *  - bloom: the sidecar prunes the batch side to possible hits, and
  *    the candidates' own per-tick reverse filter prunes the index
  *    scan to near-hit rows, which then broadcast — the index is
  *    scanned but never shuffled;
  *  - bloom, all-novel batch: zero candidates — the covered index is
  *    not read at all (the frontier-crawl common case).
  *
  * On local[32] a shuffle never crosses a network, so WALL time can't
  * separate the paths — the cluster-transferable number is SHUFFLE
  * BYTES (captured per run from stage metrics): the plain probe
  * shuffles O(index) bytes every tick, the bloom probe ~none, and on
  * a 1000-executor cluster that term is the probe cost.
  *
  * Outputs are ASSERTED identical before timing (the exactness
  * contract). Run: `sbt "runMain graft.tools.LadderBloomBench"`
  * (optional arg: output root). Prints one markdown row per variant ×
  * scale: cold, warm (min of 2), warm-run shuffle MB, hit rows.
  */
object LadderBloomBench {

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-ladbloom")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val scales = Seq(1, 4)
    val baseKeys = 2000000L // index keys at 1×
    val batchN = 50000L     // per-tick batch, fixed (the asymmetry)

    for (s <- scales) {
      val lroot = s"$root/x$s"
      // stored url index: baseKeys*s canonical keys, written once
      // (admission-time cost), then the sidecar at watermark 1
      spark.range(baseKeys * s).select(
          concat(lit("h"), (col("id") % 9973).cast("string"),
            lit(".com/p/"), col("id").cast("string")).as("url_key"),
          col("id").as("keep_id"))
        .write.mode("overwrite").parquet(s"$lroot/url_index/batch=0")
      LadderBloom.build(spark, lroot, "url_index", committedBelow = 1L)
    }

    // batch keys relations (built per call — generation is cheap and
    // identical across variants; 1% of keys re-crawl an indexed page)
    def keys(s: Int, hitPct: Int) =
      spark.range(batchN).select(col("id"),
        when(col("id") % 100 < hitPct,
            concat(lit("h"), ((col("id") * 37) % 9973).cast("string"),
              lit(".com/p/"), ((col("id") * 37) % (baseKeys * s))
                .cast("string")))
          .otherwise(concat(lit("novel"), col("id").cast("string"),
            lit(".org/q/"), col("id").cast("string"))).as("url_key"))

    def ix(s: Int) = spark.read.parquet(s"$root/x$s/url_index")
      .filter(col("batch") =!= 99L) // the own-batch exclusion shape
    def seen(s: Int, hitPct: Int, bloom: Boolean) =
      LadderBloom.seenIds(keys(s, hitPct), "url_key", "id", ix(s),
        s"$root/x$s", "url_index", 99L,
        if (bloom) LadderBloom.read(spark, s"$root/x$s", "url_index")
        else None)

    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // stage-level shuffle-write accounting (the listener bus is async:
    // settle briefly before reading a run's total)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def settledShuffle(): Long = { Thread.sleep(400); shuffleBytes.get() }

    // exactness before timing: identical hit sets, every variant
    for (s <- scales; hp <- Seq(1, 0)) {
      val plain = seen(s, hp, bloom = false)
        .as[Long].collect().toSet
      val bloomed = seen(s, hp, bloom = true)
        .as[Long].collect().toSet
      assert(plain == bloomed,
        s"x$s hit=$hp%: bloom ${bloomed.size} != plain ${plain.size}")
      release()
    }

    println("| variant | scale | index keys | cold s | warm s | shuffle MB | hits |")
    println("|---|---|---|---|---|---|---|")
    val variants = Seq(
      ("plain semi-join", 1, false), ("plain semi-join", 0, false),
      ("bloom + reverse filter", 1, true), ("bloom all-novel", 0, true))
    for ((name, hp, bloom) <- variants; s <- scales) {
      def run(): (Double, Long, Long) = {
        val s0 = settledShuffle()
        val t0 = System.nanoTime()
        val n = seen(s, hp, bloom).queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        (t, n, settledShuffle() - s0)
      }
      val (cold, n, _) = run()
      val (w1, _, sh1) = run()
      val (w2, _, sh2) = run()
      val warm = math.min(w1, w2)
      release()
      println(f"| $name (hit=$hp%%) | ${s}x | ${baseKeys * s} | $cold%.2f | " +
        f"$warm%.2f | ${math.max(sh1, sh2) / 1e6}%.1f | $n |")
    }
    spark.stop()
  }
}
