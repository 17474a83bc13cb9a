package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, IngestLadder, LadderBloom, TextOps}

/** The COMPOSED ingest tick in the REVERSE-FILTER regime — the
  * measurement the sf1-eq ladder rows can't make: their fixtures
  * (5k–50k docs) never cross [[LadderBloom.ReverseMinKeys]] (1e6), so
  * the reverse path's whole-tick cost was only ever measured in
  * isolation ([[LadderBloomBench]]). Here every index is seeded at
  * ≥2M keys (url, fp, AND postings), the sidecars are built, and the
  * SAME 50k-doc batch (~1% url re-crawls, ~1% exact copies, ~1%
  * near-dups, the rest novel) runs:
  *
  *  - each rung's PROBE in isolation (url seen / fp seen / near
  *    jaccard), plain vs bloom+reverse — per-rung wall AND per-rung
  *    shuffle bytes from stage metrics, because on local[32] a shuffle
  *    never crosses a network and wall can't show the win;
  *  - the COMPOSED [[IngestLadder.admitBatch]] tick end-to-end against
  *    two identically-seeded roots (one sidecar-less, one with
  *    sidecars), verdicts asserted identical before timing.
  *
  * The budget claim printed with the JSON: the bloom+reverse probes'
  * summed shuffle bytes stay ≤ 10% of the plain probes' — the
  * "per-tick network term is flat in index size" design claim, now
  * measured through the composed tick's own regime instead of a
  * micro-bench. Run:
  * `sbt "runMain graft.tools.ReverseTickBench"` (optional arg: work
  * root). Markdown on stderr, ONE JSON line on stdout — redirect to
  * `REVERSE_TICK.json`.
  */
object ReverseTickBench {

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-revtick")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nIdx = 2500000L // seeded index keys per rung (> ReverseMinKeys)
    val batchN = 50000L

    // the seeded corpus: 10-word docs with per-doc vocab, one page per
    // doc — url/fp/postings state is DERIVED exactly as the rungs
    // compute it (canonical key, normalized-md5, 3-shingle postings),
    // so the seeded layout is indistinguishable from 2.5M admitted docs
    def corpus: DataFrame = spark.range(nIdx).select(
      col("id").as("doc_id"),
      concat(lit("http://s"), (col("id") % 9973).cast("string"),
        lit(".com/p/"), col("id").cast("string")).as("url"),
      concat_ws(" ", transform(sequence(lit(0), lit(9)),
        t => concat(lit("w"), col("id").cast("string"), lit("x"),
          t.cast("string")))).as("text"))

    for (variant <- Seq("plain", "bloom")) {
      val vroot = s"$root/$variant"
      val c = corpus
      c.select(TextOps.canonicalUrl(col("url")).as("url_key"),
          col("doc_id").as("keep_id"))
        .write.mode(SaveMode.Overwrite).parquet(s"$vroot/url_index/batch=0")
      c.select(TextOps.fingerprint(col("text")).as("fp"),
          col("doc_id").as("keep_id"))
        .write.mode(SaveMode.Overwrite).parquet(s"$vroot/fp_index/batch=0")
      Dedup.shinglePostings(c, "doc_id", "text", 3)
        .write.mode(SaveMode.Overwrite).parquet(s"$vroot/postings/batch=0")
      if (variant == "bloom")
        LadderBloom.buildAll(spark, vroot, committedBelow = 1L)
    }
    System.err.println(s"seeded 2 roots at $nIdx keys/rung")

    // the batch: ids offset past the corpus; k = the indexed doc a
    // planted row re-visits
    def batch: DataFrame = {
      val k = (col("id") * 31) % nIdx
      val novelUrl = concat(lit("http://fresh"),
        (col("id") % 7919).cast("string"), lit(".org/q/"),
        col("id").cast("string"))
      val novelText = concat_ws(" ", transform(sequence(lit(0), lit(9)),
        t => concat(lit("b"), col("id").cast("string"), lit("x"),
          t.cast("string"))))
      def kText(upTo: Int) = transform(sequence(lit(0), lit(upTo)),
        t => concat(lit("w"), k.cast("string"), lit("x"),
          t.cast("string")))
      spark.range(batchN).select(
        (col("id") + 10000000L).as("doc_id"),
        when(col("id") % 100 === 1, concat(lit("http://s"),
            (k % 9973).cast("string"), lit(".com/p/"), k.cast("string")))
          .otherwise(novelUrl).as("url"),
        when(col("id") % 100 === 2, concat_ws(" ", kText(9)))
          .when(col("id") % 100 === 3,
            concat_ws(" ", concat(kText(8),
              array(concat(lit("zz"), col("id").cast("string"))))))
          .otherwise(novelText).as("text"))
    }

    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleBytes.addAndGet(
            e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def settled(): Long = { Thread.sleep(400); shuffleBytes.get() }

    // ---- per-rung probes in isolation -------------------------------
    // batch-side inputs precomputed once per run (identical work in
    // both variants), so the measured delta IS the probe
    def urlKeys = batch.select(col("doc_id").as("id"),
      TextOps.canonicalUrl(col("url")).as("url_key"))
    def fpKeys = batch.select(col("doc_id").as("id"),
      TextOps.fingerprint(col("text")).as("fp"))
    def batchPosts = Dedup.shinglePostings(batch, "doc_id", "text", 3)

    def ix(vroot: String, sub: String) =
      spark.read.parquet(s"$vroot/$sub").filter(col("batch") =!= 1L)
    def sc(vroot: String, sub: String, bloom: Boolean) =
      if (bloom) LadderBloom.read(spark, vroot, sub) else None
    var nearSkipped = false

    def probeOps(vroot: String, bloom: Boolean): Seq[(String, () => Long)] = Seq(
      "url" -> (() => LadderBloom.seenIds(urlKeys, "url_key", "id",
        ix(vroot, "url_index"), vroot, "url_index", 1L,
        sc(vroot, "url_index", bloom)).queryExecution.toRdd.count()),
      "fp" -> (() => LadderBloom.seenIds(fpKeys, "fp", "id",
        ix(vroot, "fp_index"), vroot, "fp_index", 1L,
        sc(vroot, "fp_index", bloom)).queryExecution.toRdd.count()),
      "near" -> { () =>
        // the production shape: the ladder always probes a multiScan-
        // cached postings relation (the regime heuristic's row count
        // materializes the same cache every probe branch then reads)
        val bp = graft.ext.Materialize.multiScan(batchPosts)
        val (pairs, skipped) = LadderBloom.postingsProbes(bp,
          ix(vroot, "postings"), vroot, 1L, sc(vroot, "postings", bloom))
        // the broadcast-regime heuristic: a batch-postings relation
        // under the broadcast threshold auto-skips the sidecar (the
        // plain probe is already exchange-free there) — record the
        // decision so the JSON says which path was measured
        if (bloom) nearSkipped = skipped
        pairs.map { case (b, i) => Dedup.jaccardProbe(b,
            i.select(col("id"), col("m"), col("sh64")), 0.5)
          .select(col("batch_id")) }
          .reduce(_ unionByName _).distinct()
          .queryExecution.toRdd.count()
      })

    final case class Meas(wall: Double, shuffleMb: Double, rows: Long)
    def measure(op: () => Long): Meas = {
      val runs = (1 to 3).map { _ =>
        val s0 = settled(); val t0 = System.nanoTime()
        val n = op()
        val t = (System.nanoTime() - t0) / 1e9
        val sh = settled() - s0
        release()
        (t, sh, n)
      }
      val best = runs.minBy(_._1)
      Meas(best._1, runs.map(_._2).max / 1e6, best._3)
    }

    System.err.println("| rung | variant | wall s | shuffle MB | hit rows |")
    System.err.println("|---|---|---|---|---|")
    val probeRows = for {
      (variant, bloom) <- Seq(("plain", false), ("bloom", true))
      (rung, op) <- probeOps(s"$root/$variant", bloom)
    } yield {
      val m = measure(op)
      System.err.println(f"| $rung | $variant | ${m.wall}%.2f | " +
        f"${m.shuffleMb}%.1f | ${m.rows} |")
      ((rung, variant), m)
    }
    val pm = probeRows.toMap
    // hit sets must agree rung for rung (exactness through the regime)
    Seq("url", "fp", "near").foreach { r =>
      require(pm((r, "plain")).rows == pm((r, "bloom")).rows,
        s"$r probe rows diverge: ${pm((r, "plain")).rows} vs " +
          s"${pm((r, "bloom")).rows}")
    }

    // ---- the composed tick ------------------------------------------
    // batchId 1, own-partition-excluded probes: every run recomputes
    // the same verdicts and overwrites in place (the sf1eq protocol)
    def tick(variant: String): DataFrame =
      IngestLadder.admitBatch(batch, "doc_id", "text", Some("url"),
        Seq.empty, s"$root/$variant", n = 3, tau = 0.5, batchId = 1L)
    val vPlain = tick("plain").groupBy(col("dropped_at"))
      .agg(count(lit(1)).as("n")).as[(Option[String], Long)]
      .collect().toMap
    release()
    val vBloom = tick("bloom").groupBy(col("dropped_at"))
      .agg(count(lit(1)).as("n")).as[(Option[String], Long)]
      .collect().toMap
    release()
    require(vPlain == vBloom,
      s"composed verdicts diverge: plain $vPlain bloom $vBloom")
    System.err.println(s"composed verdict histogram (both variants): $vBloom")
    val tickRows = Seq("plain", "bloom").map { variant =>
      val m = measure(() => tick(variant).queryExecution.toRdd.count())
      System.err.println(f"| composed_tick | $variant | ${m.wall}%.2f | " +
        f"${m.shuffleMb}%.1f | ${m.rows} |")
      (variant, m)
    }.toMap

    // the transferable budget: reverse-regime probe shuffle stays flat
    val plainProbeMb = Seq("url", "fp", "near")
      .map(r => pm((r, "plain")).shuffleMb).sum
    val bloomProbeMb = Seq("url", "fp", "near")
      .map(r => pm((r, "bloom")).shuffleMb).sum
    val budgetOk = bloomProbeMb <= plainProbeMb * 0.10
    def r2(v: Double) = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val rungJson = Seq("url", "fp", "near").map { r =>
      "\"" + r + "\":{\"plain\":{\"wall\":" + r2(pm((r, "plain")).wall) +
        ",\"shuffle_mb\":" + r2(pm((r, "plain")).shuffleMb) +
        "},\"bloom\":{\"wall\":" + r2(pm((r, "bloom")).wall) +
        ",\"shuffle_mb\":" + r2(pm((r, "bloom")).shuffleMb) + "}}"
    }.mkString(",")
    println("{\"metric\":\"reverse_tick\",\"index_keys\":" + nIdx +
      ",\"batch\":" + batchN +
      ",\"probes\":{" + rungJson + "}" +
      ",\"composed_tick\":{\"plain\":{\"wall\":" +
      r2(tickRows("plain").wall) + ",\"shuffle_mb\":" +
      r2(tickRows("plain").shuffleMb) + "},\"bloom\":{\"wall\":" +
      r2(tickRows("bloom").wall) + ",\"shuffle_mb\":" +
      r2(tickRows("bloom").shuffleMb) + "}}" +
      ",\"near_sidecar\":\"" + (if (nearSkipped)
        "auto-skipped (broadcast-probe regime: batch postings under " +
          "the broadcast threshold, plain probe is exchange-free)"
      else "covered/tail split ran") + "\"" +
      ",\"budget\":\"bloom probe shuffle <= 10% of plain\"" +
      ",\"budget_ok\":" + budgetOk + "}")
    spark.stop()
  }
}
