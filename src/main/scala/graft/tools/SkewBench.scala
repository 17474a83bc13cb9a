package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Adversarial-skew measurement: what happens to the dedup family when
  * the data is HOSTILE — web-corpus boilerplate (one shingle shared by
  * 30% of documents) and a mega-cluster (30% of the corpus in ONE
  * near-dup cluster) — and where the dial is that keeps wall-time flat.
  *
  * Complements [[ScaleBench]] (well-behaved corpora, scaling curves):
  * here the INPUT SIZE is held per scale point and the adversarial
  * structure is what varies the cost. Two demonstrations:
  *
  *  1. `jaccardPairs` hot-shingle blowup: a shingle present in c docs
  *     contributes c² rows to the inverted-index self-join but at most
  *     1 to any pair's intersection. With 30% boilerplate, un-dialed
  *     cost grows ~(0.3n)² per hot shingle while TRUE output (planted
  *     near-copies, disjoint from the boilerplate class) stays linear.
  *     `maxDocFreq` drops those shingles at the index — wall-time
  *     returns to the well-behaved curve, planted pairs all retained.
  *
  *  2. survivor selection on a mega-cluster: the argmax-via-
  *     `max(struct(score,-id))` aggregate partial-merges below the
  *     exchange, so one cluster holding 30% of the corpus ships ~1 row
  *     per input partition. The naive window form
  *     (`row_number() over (partition by cluster order by score)`)
  *     funnels the whole mega-cluster through ONE task's sort — the
  *     degradation the aggregate form exists to avoid.
  *
  * Run: `sbt "runMain graft.tools.SkewBench"` (optional arg: output
  * root; `SCALE_POINTS` env as in ScaleBench, default `1,3`). Prints
  * one markdown row per (operator, variant, scale): warm wall seconds
  * and result rows.
  */
object SkewBench {

  /** ~60-word docs over a 2k vocab, every 20th a near-copy of its
    * predecessor (the TRUE pairs — ids ≡ 18,19 mod 20, disjoint from
    * the boilerplate class below), and docs with id%10 < 3 (30%)
    * carrying an identical 12-token boilerplate header — 10 hot
    * 3-shingles, each in 0.3n documents. Boilerplate↔boilerplate
    * Jaccard stays ≈ 0.09 (10 shared of ~106 union shingles), far
    * under τ=0.25: the header adds JOIN ROWS, never true pairs.
    */
  def synthSkewDocs(spark: SparkSession, n: Long): DataFrame = {
    val seed = when(col("id") % 20 === 19, col("id") - 1).otherwise(col("id"))
    val body = transform(sequence(lit(0), lit(47)),
      i => when(col("id") % 20 === 19 && i === 0,
          concat(lit("mut"), col("id")))
        .otherwise(concat(lit("w"), pmod(hash(seed, i), lit(2000)))))
    val boiler = array((0 until 12).map(i => lit(s"bp$i")): _*)
    spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        when(col("id") % 10 < 3, concat(boiler, body)).otherwise(body))
        .as("text"))
  }

  /** Identical-vector skew: 30% of embeddings are ONE shared vector
    * (the boilerplate-embedded-n-times shape), the rest hash-scattered
    * as in ScaleBench. */
  def synthHotVecs(spark: SparkSession, n: Long): DataFrame = {
    val hot = col("id") % 10 < 3
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), i => {
        val base = pmod(hash(col("id"), i), lit(2000)).cast("double") / 1000.0 - 1.0
        when(hot, when(i === 0, 1.0).otherwise(0.0)).otherwise(base)
          .cast("float")
      }).as("embedding"))
  }

  /** 3-group priced relation: group = id mod 3 (the l_returnflag
    * shape), values hash-scattered doubles (mostly distinct — the
    * worst case for a value-buffering percentile accumulator). */
  def synthPriced(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id"),
      pmod(col("id"), lit(3)).cast("string").as("g"),
      (pmod(hash(col("id")), lit(1000000000)).cast("double") / 1000.0)
        .as("v"))

  /** Mega-cluster assignment: 30% of ids in cluster 0, the rest
    * singletons; deterministic hash scores. */
  def synthClusters(spark: SparkSession, n: Long): (DataFrame, DataFrame) = {
    val clusters = spark.range(n).select(col("id"),
      when(col("id") % 10 < 3, lit(0L)).otherwise(col("id")).as("cluster"))
    val scores = spark.range(n).select(col("id"),
      pmod(hash(col("id")), lit(1000)).cast("long").as("score"))
    (clusters, scores)
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-skew")
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS",
      String.valueOf(Runtime.getRuntime.availableProcessors())))
    val scales = sys.env.get("SCALE_POINTS")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(1, 3))
    val baseDocs = 5000L

    for (s <- scales) {
      synthSkewDocs(spark, baseDocs * s).write.mode("overwrite")
        .parquet(s"$root/docs_x$s")
      // 30% identical-direction vectors -> ONE mega-cell no centroid
      // count can split (the labelAgreement hostile shape); 16-class
      // labels so the audit output stays meaningful
      synthHotVecs(spark, 8000L * s)
        .withColumn("label", pmod(col("vec_id"), lit(16)).cast("int"))
        .write.mode("overwrite").parquet(s"$root/vecs_x$s")
    }
    def docs(s: Int) = spark.read.parquet(s"$root/docs_x$s")
    def vecs(s: Int) = spark.read.parquet(s"$root/vecs_x$s")

    def release(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val ops: Seq[(String, Int => DataFrame)] = Seq(
      "jaccardPairs un-dialed" -> (s => graft.ext.Dedup.jaccardPairs(
        docs(s), "doc_id", "text", n = 3, tau = 0.25)),
      "jaccardPairs maxDocFreq=100" -> (s => graft.ext.Dedup.jaccardPairs(
        docs(s), "doc_id", "text", n = 3, tau = 0.25, maxDocFreq = 100)),
      // the prefix-filtered route needs NO dial here and stays EXACT:
      // document-frequency order ranks the 10 hot shingles LAST in
      // every document, outside every prefix (length (1-τ)m+1), so the
      // c² postings never enter the candidate join — the structural
      // answer to the shape maxDocFreq answers by under-approximating
      "jaccardPrefix un-dialed (exact)" -> (s => graft.ext.Dedup
        .jaccardPairsPrefix(docs(s), "doc_id", "text", n = 3, tau = 0.25)),
      // containment has NO length-ratio prune (see containmentPairs
      // scaladoc), so the hot-shingle c² blowup hits it with nothing
      // else in the way — the dial is not an optimization here but the
      // only defense
      // the identical-vector mega-cell: no centroid count (the scale
      // contract is nCells ∝ √n — the true IVF rule) can split a blob
      // of near-identical vectors, so the blob cell's pair space goes
      // quadratic; maxCellPool caps each cell's candidate pool at a
      // deterministic hash sample (statistically safe exactly here —
      // pool members are near-identical to the excluded ones)
      "labelAgreementCells un-dialed" -> (s => graft.ext.Similarity
        .labelAgreementCells(vecs(s), "vec_id", "embedding", "label",
          k = 5, nCells = (16 * math.sqrt(s.toDouble)).round.toInt)),
      "labelAgreementCells maxCellPool=200" -> (s => graft.ext.Similarity
        .labelAgreementCells(vecs(s), "vec_id", "embedding", "label",
          k = 5, nCells = (16 * math.sqrt(s.toDouble)).round.toInt,
          maxCellPool = 200)),
      "containmentPairs un-dialed" -> (s => graft.ext.Dedup.containmentPairs(
        docs(s), "doc_id", "text", n = 3, tau = 0.5)),
      "containmentPairs maxDocFreq=100" -> (s => graft.ext.Dedup.containmentPairs(
        docs(s), "doc_id", "text", n = 3, tau = 0.5, maxDocFreq = 100)),
      // ×400 the doc count: the mega-cluster must be millions of rows
      // before a single task's sort visibly pays — 600k/1.8M members at
      // the default points
      "survivors argmax-agg" -> { s =>
        val (clusters, scores) = synthClusters(spark, baseDocs * s * 400)
        graft.ext.Dedup.survivors(clusters, scores)
      },
      "survivors naive window" -> { s =>
        // the shape the aggregate form replaces: whole mega-cluster
        // through one task's sort
        val (clusters, scores) = synthClusters(spark, baseDocs * s * 400)
        val w = Window.partitionBy(col("cluster"))
          .orderBy(col("score").desc, col("id").asc)
        clusters.join(scores, "id")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      },
      // semanticDedup's hostile shape: 30% of vectors IDENTICAL (one
      // boilerplate embedding) — the within-cell pair join is quadratic
      // in the duplicate count without the exact-duplicate pre-collapse,
      // linear with it; output identical (oracle + spec pinned)
      "semanticDedup all-pairs" -> (s =>
        graft.ext.Similarity.semanticDedup(synthHotVecs(spark, 3000L * s),
          "vec_id", "embedding", k = 16, tau = 0.7, collapseExact = false)
          .filter(!col("keep"))),
      "semanticDedup collapseExact" -> (s =>
        graft.ext.Similarity.semanticDedup(synthHotVecs(spark, 3000L * s),
          "vec_id", "embedding", k = 16, tau = 0.7)
          .filter(!col("keep"))),
      // r14: the long-chain hostile graph — diameter = n, the shape
      // that defeats O(diameter) label propagation outright (the r13
      // fallback would have needed 500k rounds at 1× and silently
      // stopped wrong at 25); large-star/small-star contraction
      // collapses any chain in ~log n rounds. driverLimit=0 forces the
      // distributed path.
      "connectedComponents long chain" -> { s =>
        val n = baseDocs * s * 100
        val (labels, rounds) = graft.ext.Dedup.connectedComponentsWithRounds(
          spark.range(1, n).select(col("id").as("id_a"),
            (col("id") + 1).as("id_b")),
          driverLimit = 0L)
        System.err.println(s"[cc chain ${s}x: $rounds contraction rounds]")
        labels
      },
      // r15: the BROOM (star-of-chains) — the shape where large-star
      // actually FANS: a hub with 1000 chain heads, each chain
      // n/1000 long (~1.7M/5M edges at the default points). The chain
      // row above exercises pure depth; this one makes every
      // large-star round push a growing frontier of hub edges while
      // small-star flattens the chains — both steps do real work every
      // round, and the measured round count pins the ~log n claim on a
      // fanning graph, not just the citation.
      "connectedComponents broom 1000 chains" -> { s =>
        val n = baseDocs * s * 333
        // guard the pmod divisor: a tiny baseDocs dial would make
        // n/1000 = 0 and NULL every edge instead of building the broom
        val chainLen = math.max(1L, n / 1000)
        val (labels, rounds) = graft.ext.Dedup.connectedComponentsWithRounds(
          spark.range(1, n).select(col("id").as("id_a"),
            when(pmod(col("id"), lit(chainLen)) === 1, lit(0L))
              .otherwise(col("id") - 1).as("id_b")),
          driverLimit = 0L)
        System.err.println(s"[cc broom ${s}x: $rounds contraction rounds]")
        labels
      },
      // r11: exact group percentiles under the low-cardinality-group
      // shape (3 groups over millions of mostly-distinct doubles). The
      // value-buffering `percentile` aggregate final-merges in exactly
      // 3 tasks, each holding its group's ENTIRE value→count map; the
      // distributed rank form range-partitions and its final aggregate
      // sees ≤ 8 rows per group. Same results (PrefixSpec pins bits).
      "percentiles value-buffering" -> { s =>
        synthPriced(spark, baseDocs * s * 400).groupBy(col("g")).agg(
          expr("percentile(v, 0.25)").as("p25"),
          expr("percentile(v, 0.5)").as("p50"),
          expr("percentile(v, 0.75)").as("p75"),
          expr("percentile(v, 0.95)").as("p95"))
      },
      "percentiles distributed rank" -> { s =>
        graft.ext.Prefix.groupPercentiles(
          synthPriced(spark, baseDocs * s * 400), Seq("g"), col("v"),
          tiebreak = Seq(col("id")),
          ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75",
            0.95 -> "p95"))
      })

    // warmup pass at the smallest scale
    val warmScale = scales.min
    for ((_, op) <- ops) { op(warmScale).count(); release() }

    println("| operator | scale | input rows | cold s | warm s | out rows |")
    println("|---|---|---|---|---|---|")
    for ((name, op) <- ops; s <- scales) {
      def run(): (Double, Long) = {
        val t0 = System.nanoTime()
        // the honest protocol (graft.Bench): execute the query's OWN
        // plan — a stacked .count() lets Catalyst drop unused final
        // aggregate expressions (the argmax and percentile variants
        // would be "measured" without their aggregates)
        val rows = op(s).queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (cold, rows) = run()
      val warm = run()._1
      release()
      val inRows =
        if (name.startsWith("survivors") ||
          name.startsWith("percentiles")) baseDocs * s * 400
        else if (name.contains("broom")) baseDocs * s * 333
        else if (name.startsWith("connectedComponents")) baseDocs * s * 100
        else if (name.startsWith("semanticDedup")) 3000L * s
        else baseDocs * s
      println(f"| $name | ${s}x | $inRows | $cold%.2f | $warm%.2f | $rows |")
    }
    spark.stop()
  }
}
