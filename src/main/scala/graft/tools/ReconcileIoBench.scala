package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.IncrementalDedup

/** BYTES READ per maintenance-window reconcile, 1× vs 10× corpus at a
  * FIXED frontier — the IO axis of the frontier-not-corpus claim that
  * wall-clock cannot show on one box (local reads are page-cache hits;
  * at 100 TB every byte crosses a disk or a network).
  *
  * The round-18 incremental reconcile made the window's SHUFFLE and
  * pair/CC terms frontier-sized but still scanned the full
  * postings+evidence relation once per closure hop (and once for the
  * dial). This round's layout closes the IO term:
  *
  *  - closure hops run as driver-collected point lookups pushed into
  *    the scans as IN filters ([[IncrementalDedup
  *    .reconcileNearIncremental]]);
  *  - the maintenance fold range-sorts `postings`/`postings_dropped`
  *    by `sh64` and the `doc_shingles` sidecar by `id`
  *    ([[graft.ext.Layout.foldBatchPartitions]]'s sort option), so
  *    each pushed IN prunes file groups via parquet min/max stats;
  *  - the hot-shingle dial reads the `shingle_counts` sidecar instead
  *    of re-aggregating the postings union.
  *
  * Fixture = the sf1eq reconcile corpus (groups of 3 with roles
  * admitted/evidence/reconciled) CONVERGED, then one fixed 500-doc
  * tick whose docs chain only through apply-retired evidence — the
  * `reconcile_near_inc` fixture at 1× (5k docs) and 10× (50k docs),
  * folded at a small file target so both scales have enough file
  * groups for pruning to be measurable (at 100 TB the fold's 128 MB
  * default gives ~10⁶ file groups; locally we shrink the target
  * instead of inflating the corpus).
  *
  * Measured per scale, stage-metrics `inputMetrics.bytesRead` summed
  * over the operator's jobs, best of 3 (max bytes of the runs —
  * conservative), caches cleared between runs:
  *  - `inc`:  [[IncrementalDedup.reconcileNearIncrementalMode]] at the
  *    recorded watermark (asserted mode = incremental);
  *  - `full`: [[IncrementalDedup.reconcileNear]] — the contrast whose
  *    IO is the corpus by construction.
  *
  * The printed budget: incremental bytes grow SUBLINEARLY (≤ 3× over a
  * 10× corpus — file-count effects keep the local ratio above the
  * asymptotic flat line; the pruning math in SCALE.md shows why the
  * ratio falls toward 1 as file groups outnumber frontier keys), while
  * the full form grows ≈ linearly. One JSON line on stdout — redirect
  * to `RECONCILE_IO.json`.
  */
object ReconcileIoBench {

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-recio")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val scales = Seq(1, 10)
    val baseDocs = 5000L
    val tau = 0.5

    def reconDocs(n: Long) = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(
        sequence(col("id") % 3 * 2, col("id") % 3 * 2 + 7),
        k => concat(lit("g"), expr("id div 3").cast("string"),
          lit("w"), k.cast("string")))).as("text"))

    for (s <- scales) {
      val r = s"$root/x$s"
      val fs = new org.apache.hadoop.fs.Path(r).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(r), true)
      val rd = reconDocs(baseDocs * s)
      IncrementalDedup.admitBatchLadder(rd.filter(col("doc_id") % 3 =!= 2),
        "doc_id", "text", None, r, n = 3, tau = tau, batchId = 0L)
      IncrementalDedup.admitBatchLadder(rd.filter(col("doc_id") % 3 === 2),
        "doc_id", "text", None, r, n = 3, tau = tau, batchId = 1L)
      // converge + record, then FOLD with a small file target so both
      // scales have prunable file-group counts (the sorted-fold layout
      // under test); the fixed 500-doc tick lands after the fold
      // retire = false: the evidence stays, so the tick's docs CHAIN
      // through it and the measured window carries a real 500-doc
      // delta (the Sf1EqBench reconincroot shape)
      IncrementalDedup.reconcileWindow(spark, r, "doc_id", tau = tau,
        committedBelow = 2L, targetBytes = 64L << 10)
      val tick = spark.range(500).select(
        (col("id") + 10000000L).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(6), lit(13)),
          k => concat(lit("g"), col("id").cast("string"),
            lit("w"), k.cast("string")))).as("text"))
      IncrementalDedup.admitBatchLadder(tick, "doc_id", "text", None,
        r, n = 3, tau = tau, batchId = 2L)
      spark.catalog.clearCache()
      System.err.println(s"fixture x$s built at $r")
    }

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          bytesRead.addAndGet(
            e.stageInfo.taskMetrics.inputMetrics.bytesRead)
      })
    def settled(): Long = { Thread.sleep(400); bytesRead.get() }
    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    final case class Meas(wall: Double, mb: Double, rows: Long)
    def measure(op: () => Long): Meas = {
      val runs = (1 to 3).map { _ =>
        val b0 = settled(); val t0 = System.nanoTime()
        val n = op()
        val t = (System.nanoTime() - t0) / 1e9
        val b = settled() - b0
        release()
        (t, b, n)
      }
      Meas(runs.map(_._1).min, runs.map(_._2).max / 1e6, runs.head._3)
    }

    System.err.println("| scale | op | wall s | read MB | delta rows |")
    System.err.println("|---|---|---|---|---|")
    val rows = for (s <- scales) yield {
      val r = s"$root/x$s"
      val inc = measure { () =>
        val (d, mode) = IncrementalDedup.reconcileNearIncrementalMode(
          spark, r, tau, sinceBatch = 2L)
        require(mode == 0L, s"expected the incremental path, got " +
          IncrementalDedup.ReconcileModes(mode))
        d.queryExecution.toRdd.count()
      }
      System.err.println(
        f"| ${s}x | inc | ${inc.wall}%.2f | ${inc.mb}%.1f | ${inc.rows} |")
      val fullM = measure(() => IncrementalDedup.reconcileNear(
        spark, r, tau).queryExecution.toRdd.count())
      System.err.println(
        f"| ${s}x | full | ${fullM.wall}%.2f | ${fullM.mb}%.1f | ${fullM.rows} |")
      require(inc.rows == fullM.rows,
        s"delta divergence at ${s}x: ${inc.rows} vs ${fullM.rows}")
      (s, inc, fullM)
    }
    val x1 = rows.find(_._1 == 1).get
    val x10 = rows.find(_._1 == 10).get
    val incRatio = x10._2.mb / math.max(0.001, x1._2.mb)
    val fullRatio = x10._3.mb / math.max(0.001, x1._3.mb)
    def r2(v: Double) = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    println("{\"metric\":\"reconcile_window_io\"" +
      ",\"fixed_frontier_docs\":500" +
      ",\"x1\":{\"inc_mb\":" + r2(x1._2.mb) + ",\"full_mb\":" +
      r2(x1._3.mb) + ",\"inc_wall\":" + r2(x1._2.wall) +
      ",\"full_wall\":" + r2(x1._3.wall) + "}" +
      ",\"x10\":{\"inc_mb\":" + r2(x10._2.mb) + ",\"full_mb\":" +
      r2(x10._3.mb) + ",\"inc_wall\":" + r2(x10._2.wall) +
      ",\"full_wall\":" + r2(x10._3.wall) + "}" +
      ",\"inc_bytes_ratio\":" + r2(incRatio) +
      ",\"full_bytes_ratio\":" + r2(fullRatio) +
      ",\"budget\":\"inc bytes grow <= 3x over a 10x corpus at fixed " +
      "frontier; full grows with the corpus\"" +
      ",\"budget_ok\":" + (incRatio <= 3.0) + "}")
    spark.stop()
  }
}
