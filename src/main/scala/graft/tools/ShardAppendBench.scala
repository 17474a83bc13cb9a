package graft.tools

import org.apache.spark.sql.functions._

/** Measures the posture claim behind `Splits.appendShards`: appending a
  * FIXED-size batch to an existing shard export costs batch time — flat
  * in how much is already exported — because the committed layout is
  * the frozen prefix of the global order (one footer-only
  * partition-column aggregate finds the tail; only the batch is
  * ranked). The contrast line re-runs the full `shardExport` over the
  * grown corpus each time — the cost a naive per-release re-export
  * pays, linear in TOTAL size.
  *
  * Run: `sbt "runMain graft.tools.ShardAppendBench"` (optional arg:
  * work root). Markdown rows on stderr; appends are real (each tick
  * appends a DISTINCT id range, so the export genuinely grows).
  */
object ShardAppendBench {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-shardappend")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors())))
    val baseDocs = 50000L
    val batchRows = 5000L
    val shardSize = 1024L

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    System.err.println(
      "| existing rows | op | tick | wall s | shards touched |")
    System.err.println("|---|---|---|---|---|")
    for (s <- Seq(1, 10)) {
      val n = baseDocs * s
      val dir = s"$root/x$s"
      // setup (untimed): the existing export
      val corpus = ScaleBench.synthDocs(spark, n).select("doc_id", "text")
      graft.ext.Splits.writeShards(
        graft.ext.Splits.shardExport(corpus, Seq("doc_id"), shardSize), dir,
        shardSize)
      // three real appends, each a DISTINCT id range — the export grows
      for (tick <- 0 until 3) {
        val batch = ScaleBench.synthDocs(spark, batchRows)
          .select((col("doc_id") + n + tick * batchRows).as("doc_id"),
            col("text"))
        val (wall, range) = time {
          graft.ext.Splits.appendShards(dir, batch, Seq("doc_id"),
            shardSize)
        }
        val touched = range.map { case (a, b) => s"$a-$b" }.getOrElse("-")
        System.err.println(
          f"| $n | appendShards | $tick | $wall%.2f | $touched |")
      }
      // the naive alternative at this size: re-rank AND rewrite
      // everything (what a per-release fresh export actually pays)
      val grown = spark.read.parquet(dir).select("doc_id", "text")
      val (reWall, _) = time {
        graft.ext.Splits.writeShards(
          graft.ext.Splits.shardExport(grown, Seq("doc_id"), shardSize),
          s"$root/rewrite_x$s", shardSize)
      }
      System.err.println(
        f"| ${n + 3 * batchRows} | full re-export (rank + rewrite) | - | $reWall%.2f | all |")
    }
    spark.stop()
  }
}
