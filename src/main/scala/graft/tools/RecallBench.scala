package graft.tools

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Measured recall of the content-defined-anchor ExactSubstr
  * approximation (`Dedup.substringDupSpans` / `substringDupCoverage`)
  * against exact ground truth.
  *
  * Ground truth is computable at bench scale without a suffix array:
  * `anchorMod = 1` makes EVERY byte offset an anchor, so the window set
  * is the full all-offsets set — and for any true duplicated span of
  * length ≥ `winBytes`, every one of its windows is duplicated, so the
  * interval union of all-offset dup windows IS the exact
  * suffix-array-style duplicated-span set (byte-for-byte). Recall of
  * `anchorMod = m` is then simply covered-bytes(m) / covered-bytes(1):
  * anchored windows are a subset of all windows, and a shared span is
  * anchored at the SAME content positions in every copy (the
  * content-defined property), so no one-sided matches exist.
  *
  * The planted corpus pairs docs sharing spans of 60..400 bytes at
  * independent random offsets inside random filler — the miss
  * probability for a span of byte length L is ≈ (1 - 1/m)^(L - win + 1)
  * (no anchor lands in the span's window-start interior), which is the
  * curve this tool turns into numbers for SCALE.md.
  *
  * Run: `sbt "runMain graft.tools.RecallBench"`.
  */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("32")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz      "
    def filler(n: Int): String =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString

    val spanLens = Seq(60, 80, 100, 150, 200, 300, 400)
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Int)]
    var id = 0L
    spanLens.foreach { len =>
      (0 until 30).foreach { _ =>
        val span = filler(len)
        (0 until 2).foreach { _ =>
          docs += ((id, s"${filler(50 + rnd.nextInt(400))} $span " +
            s"${filler(50 + rnd.nextInt(400))}", len))
          id += 1
        }
      }
    }
    (0 until 200).foreach { _ => docs += ((id, filler(600), 0)); id += 1 }

    val df = docs.toSeq.toDF("doc_id", "text", "span_len")
      .repartition(32).cache()
    df.count()
    val spanLenOf = docs.map(d => d._1 -> d._3).toMap

    def covered(mod: Int): Map[Long, Long] =
      Dedup.substringDupCoverage(df, "doc_id", "text",
          winBytes = 40, anchorMod = mod, dropAtBp = 5000)
        .select(col("id"), col("covered_bytes"))
        .as[(Long, Long)].collect().toMap

    val truth = covered(1)
    val totalTruth = truth.values.sum
    val dupDocs = truth.count(_._2 > 0)
    println(s"truth (anchorMod=1, all offsets): $totalTruth covered bytes " +
      s"across $dupDocs docs with dup spans")
    Seq(4, 8, 16).foreach { m =>
      val got = covered(m)
      val tot = got.values.sum
      val missed = truth.filter { case (k, v) =>
        v > 0 && got.getOrElse(k, 0L) == 0L }
      val missByLen = missed.keys.groupBy(spanLenOf).view
        .mapValues(_.size).toMap
      println(f"anchorMod=$m%2d: covered $tot%9d bytes  " +
        f"byte-recall ${tot.toDouble / totalTruth}%.4f  " +
        s"docs fully missed ${missed.size}/$dupDocs " +
        s"(by span len: ${missByLen.toSeq.sortBy(_._1).mkString(", ")})")
    }
    spark.stop()
  }
}
