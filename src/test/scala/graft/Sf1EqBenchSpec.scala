package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.tools.Sf1EqBench

/** Guards for the sf1-equivalent bench harness's input claims — the
  * artifact's 10×-vs-1× ratios only mean something if the generators
  * really scale the WORK and keep every gate binding:
  *
  *  - `synthDocsEn`: the v1 chain's language and quality gates must
  *    drop the planted gibberish (`id % 17 == 13`) and admit the rest —
  *    a gate admitting 100% (or 0%) measures a different pipeline;
  *  - `scaledEvents`: replicas must preserve the `% 50` DLQ-corruption
  *    and `% 97` control-record fractions exactly (the envelope queries'
  *    selectivities), keep per-key history depth constant, and scale the
  *    compaction GROUP count by k.
  */
class Sf1EqBenchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("run_ingest_loop fixture shape: a 4-file parquet stream + config " +
      "drives the REAL RunIngest entry point — one tick per file, a " +
      "maintenance window every 2 ticks, verdicts cover every doc, the " +
      "url plant drops, and a state wipe makes the run repeatable") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_ringest_fix").toString
    // miniature of the bench generator: ScaleBench docs + the ~6%
    // re-crawl url plant, split into 4 tick files
    val d = graft.tools.ScaleBench.synthDocs(spark, 200L)
      .withColumn("url", concat(lit("http://b.com/p/"),
        when(col("doc_id") % 16 === 15, col("doc_id") - 1)
          .otherwise(col("doc_id")).cast("string")))
    for (t <- 0 until 4)
      d.filter(pmod(col("doc_id"), lit(4)) === t).coalesce(1)
        .write.mode("append").parquet(s"$base/src")
    val cfgPath = s"$base/cfg.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath),
      s"""{
         |  "source_format": "parquet", "source_path": "$base/src",
         |  "source_options": {"maxFilesPerTrigger": "1"},
         |  "source_schema_ddl": "doc_id LONG, text STRING, url STRING",
         |  "id_col": "doc_id", "text_col": "text", "url_col": "url",
         |  "root": "$base/run/root",
         |  "checkpoint_location": "$base/run/ckpt",
         |  "shingle_n": 3, "near_tau_x10k": 2500,
         |  "domain_quota": 1000, "maintain_every": 2,
         |  "retire_evidence": true, "retire_lag_windows": 1,
         |  "refund_quota": true, "build_sidecars": true,
         |  "monitor_conf": {"mu_bp": 0, "kappa_bp": 5000,
         |    "h_bp": 1000000}
         |}""".stripMargin)
    def runOnce(): Map[Option[String], Long] = {
      val cfg = graft.config.IngestConfig.fromFile(cfgPath)
      val q = graft.tools.RunIngest.start(spark, cfg)
      q.processAllAvailable(); q.stop()
      spark.sharedState.cacheManager.clearCache()
      spark.read.parquet(s"${cfg.root}/verdicts")
        .groupBy(col("dropped_at")).agg(count(lit(1)).as("n"))
        .as[(Option[String], Long)].collect().toMap
    }
    val v1 = runOnce()
    assert(v1.values.sum == 200L, s"verdicts cover every doc: $v1")
    assert(v1.getOrElse(Some("url"), 0L) > 0, s"url plant binding: $v1")
    // maxFilesPerTrigger=1 -> 4 ticks -> windows at ids 1 and 3: the
    // second window records on the incremental path's watermark chain
    assert(graft.ext.IncrementalDedup.reconciledWatermarks(
      spark, s"$base/run/root") == Seq(1L, 3L), "two windows recorded")
    // the bench's restoreBefore contract: wiping run/ makes the loop
    // repeat from scratch with identical verdicts
    val p = new org.apache.hadoop.fs.Path(s"$base/run")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    assert(runOnce() == v1, "pristine-restore runs are identical")
  }

  test("synthDocsEn: lang+quality gates binding — gibberish plant dropped, clean docs admitted") {
    import graft.ext.TextOps
    val docs = Sf1EqBench.synthDocsEn(spark, 1000L)
    val scored = docs.select(col("doc_id"),
        TextOps.langIdHeuristic(col("text")).as("lang"),
        TextOps.qualityFromCounts(TextOps.nTokens(col("text")),
          TextOps.nStopwords(col("text")), TextOps.nPunct(col("text")),
          length(col("text"))).as("quality"))
      .withColumn("gibberish", col("doc_id") % 17 === 13)
      .withColumn("admitted", col("lang") === "en" && col("quality") >= 55)
      .groupBy(col("gibberish"), col("admitted")).count()
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2))
      .toMap
    // every planted doc rejected, every clean doc admitted
    assert(scored.getOrElse((true, true), 0L) == 0L)
    assert(scored.getOrElse((false, false), 0L) == 0L)
    assert(scored((true, false)) == 1000L / 17 + (if (1000 % 17 > 13) 1 else 0))
    // and the v1 chain itself produces per-source rows on this corpus
    val out = Sf1EqBench.prepCompositeV1Op(docs).collect()
    assert(out.length == 5 && out.forall(_.getLong(1) > 0))
  }

  test("scaledEvents: %50/%97 fractions exact, group count scales, history depth constant") {
    val x1 = Sf1EqBench.scaledEvents(spark, sf, 1)
    val x3 = Sf1EqBench.scaledEvents(spark, sf, 3)
    val Seq(n1, n3) = Seq(x1, x3).map(_.count())
    assert(n3 == 3 * n1)
    def frac(df: org.apache.spark.sql.DataFrame, m: Int) =
      df.filter(col("event_id") % m === 0).count()
    assert(frac(x3, 50) == 3 * frac(x1, 50), "DLQ corruption fraction")
    assert(frac(x3, 97) == 3 * frac(x1, 97), "control-record fraction")
    val groups1 = x1.select(col("event_type"), col("user_id")).distinct().count()
    val groups3 = x3.select(col("event_type"), col("user_id")).distinct().count()
    assert(groups3 == 3 * groups1, "compaction group count scales with k")
    val maxDepth1 = x1.groupBy(col("event_type"), col("user_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    val maxDepth3 = x3.groupBy(col("event_type"), col("user_id")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxDepth1 == maxDepth3, "per-key history depth replica-invariant")
  }
}
