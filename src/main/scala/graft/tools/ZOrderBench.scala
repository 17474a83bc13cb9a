package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.ZOrder

/** Measures the curve-clustered layout's scale claim (SCALE.md): a box
  * query over a [[graft.ext.ZOrder.zorderWrite]] layout reads a roughly
  * CONSTANT fraction of files as the table grows (the query box
  * intersects a bounded neighborhood of the curve), while the full-scan
  * filter's cost is linear in the table — so the wall-clock gap must
  * WIDEN with scale, with the pruned answer row-for-row equal to the
  * full scan (asserted here and pinned by the `q_zorder_prune` gate).
  *
  * Synthetic points: two independent uniform dims derived from xxhash64
  * of the id (deterministic, no RNG), a ~100-byte payload so file IO is
  * real. Files grow with the data at fixed rows-per-file (the shard
  * convention: parallelism scales, file size doesn't).
  *
  * Two query shapes per scale and curve:
  *  - `box2%`: 2% × 2% box — the selective lookup both curves excel at
  *  - `stripeA`: 3% of dimA, ALL of dimB — the shape where hilbert's
  *    tighter locality beats plain bit-interleave (the spec's
  *    certificate, re-measured at scale)
  *
  * Run: `sbt "runMain graft.tools.ZOrderBench"` (optional arg: output
  * root, default /tmp/graft-zorder).
  */
object ZOrderBench {

  def synthPoints(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id"),
      pmod(xxhash64(col("id"), lit("a")), lit(1000000L)).as("a"),
      pmod(xxhash64(col("id"), lit("b")), lit(1000000L)).as("b"),
      // ~100-byte payload: pruning must save real IO, not empty rows
      repeat(md5(col("id").cast("string")), 3).as("payload"))

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-zorder")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val scales = Seq(1, 4)
    val baseRows = 2000000L
    val baseFiles = 32

    for (s <- scales; curve <- Seq("z", "hilbert")) {
      val dir = s"$root/${curve}_x$s"
      ZOrder.zorderWrite(synthPoints(spark, baseRows * s), dir,
        "a", "b", nFiles = baseFiles * s, curve = curve)
    }
    // baseline: the same rows in arrival (id) order — what a plain
    // ingest leaves on disk; parquet row-group min/max stats can skip
    // nothing because every file/row-group spans the whole (a, b) space
    for (s <- scales)
      synthPoints(spark, baseRows * s)
        .repartitionByRange(baseFiles * s, col("id"))
        .write.mode("overwrite").parquet(s"$root/linear_x$s")

    // query boxes (dims span [0, 1e6))
    val queries = Seq(
      ("box2%", (200000L, 220000L, 500000L, 520000L)),
      ("stripeA", (480000L, 510000L, 0L, 999999L)))

    def agg(df: DataFrame) =
      df.agg(count(lit(1)), sum(length(col("payload")))).collect()(0)

    // pruned == full scan, every layout and box (the correctness claim)
    for (s <- scales; curve <- Seq("z", "hilbert");
         (_, (la, ha, lb, hb)) <- queries) {
      val dir = s"$root/${curve}_x$s"
      val p = agg(ZOrder.prunedRead(spark, dir, la, ha, lb, hb))
      val f = agg(spark.read.parquet(dir)
        .filter(col("a").between(la, ha) && col("b").between(lb, hb)))
      require(p == f, s"pruned != full at $dir: $p vs $f")
    }

    println("| curve | scale | rows | query | files kept | cold s (pruned) | warm s (pruned) | warm s (clustered full scan) | warm s (linear layout scan) | rows out |")
    println("|---|---|---|---|---|---|---|---|---|---|")
    for (curve <- Seq("z", "hilbert"); s <- scales;
         (qname, (la, ha, lb, hb)) <- queries) {
      val dir = s"$root/${curve}_x$s"
      val (kept, total) = ZOrder.pruneFiles(spark, dir, la, ha, lb, hb)
      def timed(df: => DataFrame): Double = {
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      def pruned() = ZOrder.prunedRead(spark, dir, la, ha, lb, hb)
      def full() = spark.read.parquet(dir)
        .filter(col("a").between(la, ha) && col("b").between(lb, hb))
      def linear() = spark.read.parquet(s"$root/linear_x$s")
        .filter(col("a").between(la, ha) && col("b").between(lb, hb))
      val cold = timed(pruned())
      val warmP = math.min(timed(pruned()), timed(pruned()))
      val warmF = math.min(timed(full()), timed(full()))
      val warmL = math.min(timed(linear()), timed(linear()))
      val nOut = pruned().count()
      println(f"| $curve | ${s}x | ${baseRows * s} | $qname | ${kept.size}/$total | $cold%.2f | $warmP%.2f | $warmF%.2f | $warmL%.2f | $nOut |")
    }
    spark.stop()
  }
}
