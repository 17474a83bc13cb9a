package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank / prefix-sum.
  *
  * `Window.orderBy(...)` with no `partitionBy` funnels the ENTIRE relation
  * through one task — the classic single-partition scale-killer: at 100 TB
  * it is one executor core processing everything. These helpers compute
  * the same total-order quantities with full parallelism via the
  * textbook two-pass scheme:
  *
  *   1. range-repartition on the order keys (Spark's `RangePartitioner`,
  *      sampled boundaries — partition i holds a contiguous key range and
  *      partitions are themselves ordered);
  *   2. rank / running-sum WITHIN each partition (a window partitioned by
  *      the partition id — every partition is an independent task);
  *   3. collect the per-partition subtotals to the driver (one long per
  *      partition — tiny at any scale) and broadcast the exclusive
  *      prefix of those subtotals back as each partition's offset.
  *
  * The result is identical to the single-partition window for any range
  * partitioning, because the quantities depend only on the total order of
  * the keys, not on where the boundaries fall. Rows that compare equal on
  * the order keys land in the same range partition, so ties behave
  * exactly as in the single-window formulation — which also means the
  * order should END IN A UNIQUE TIEBREAKER (callers use the row id):
  * a low-cardinality key alone caps parallelism at its distinct count,
  * since each key's rows cannot be split across range partitions.
  *
  * The ranged projection is persisted ([[Materialize.multiScan]]) so the
  * subtotal pass and the main pass read the same materialized
  * partitioning (and the range exchange runs once, not twice). A cache
  * eviction between the passes is safe: recompute replays the SAME
  * shuffle dependency (the `RangePartitioner`'s sampled boundaries are
  * fixed when the dependency is created), so `__pid` is stable.
  */
object Prefix {

  /** `df` plus column `out` = global `row_number()` over `order`. */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    core(df, order, None, out)

  /** `df` plus column `out` = global running sum of `value` (rows from the
    * start of the order through the current row, inclusive).
    */
  def globalRunningSum(df: DataFrame, order: Seq[Column], value: Column,
                       out: String): DataFrame =
    core(df, order, Some(value), out)

  /** `df` plus column `out` = `ntile(k).over(Window.partitionBy(strata)
    * .orderBy(order))` — same buckets, same remainder distribution — but
    * WITHOUT the per-stratum single-partition sort. `ntile` gets no
    * `WindowGroupLimit` prune (every row survives to the sort, unlike
    * rank-1 filters), so the plain window funnels each stratum through
    * ONE task: at 100 TB that is tens of TB per task. Here the rank
    * comes from [[globalRowNumber]] over (strata ++ order) — fully
    * distributed because the order ends in the caller's unique
    * tiebreaker — and the bucket is ntile's closed form applied to
    * rank-within-stratum:
    *
    *   q = n div k; rem = n mod k       (first `rem` buckets get q+1)
    *   r ≤ rem·(q+1):  bucket = (r−1) div (q+1) + 1
    *   otherwise:      bucket = rem + (r − rem·(q+1) − 1) div q + 1
    *
    * The per-stratum (first_rank, count) relation is stratum-cardinality
    * sized and broadcasts. `CaseWhen` evaluates lazily per row, so the
    * `div q` branch is never reached when q = 0 (n < k ⇒ every rank
    * takes the first branch, bucket = r — exactly ntile's behavior).
    */
  def stratifiedNtile(df: DataFrame, strata: Seq[Column], order: Seq[Column],
                      k: Int, out: String): DataFrame = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    val rn = "__strat_rn"
    val ranked = core(df, strata ++ order, None, rn)
    val r = col(rn) - col("__first") + 1
    val q = expr(s"__n div $k")
    val rem = col("__n") % k
    attachStratumStats(ranked, strata, rn)
      .withColumn(out,
        when(r <= rem * (q + 1),
          expr(s"($rn - __first) div ((__n div $k) + 1) + 1"))
          .otherwise(
            expr(s"(__n % $k) + (($rn - __first + 1) - (__n % $k) * ((__n div $k) + 1) - 1) div (__n div $k) + 1"))
          .cast("int"))
      .drop(rn, "__first", "__n")
  }

  /** Attach per-stratum `__first` (min of `rn`) and `__n` (count) to a
    * ranked relation: the stratum-cardinality stats are broadcast and
    * joined back NULL-SAFELY (`<=>`) — window `partitionBy` groups NULL
    * strata into their own bucket set, and a plain equality join would
    * silently drop those rows instead. Stats columns are renamed so the
    * join condition is unambiguous, then dropped. Shared by
    * [[stratifiedNtile]] and `Splits.exactSplit` — one definition of
    * the null-stratum semantics on purpose.
    */
  private[graft] def attachStratumStats(ranked: DataFrame,
                                        strata: Seq[Column],
                                        rn: String): DataFrame = {
    val stats = ranked.groupBy(strata: _*)
      .agg(min(col(rn)).as("__first"), count(lit(1)).as("__n"))
    val strataNames = stats.columns.dropRight(2)
    val statsR = broadcast(strataNames.zipWithIndex.foldLeft(stats) {
      case (d, (c, i)) => d.withColumnRenamed(c, s"__ss$i")
    })
    val cond = strataNames.zipWithIndex
      .map { case (c, i) => ranked(c) <=> statsR(s"__ss$i") }
      .reduce(_ && _)
    ranked.join(statsR, cond)
      .drop(strataNames.indices.map(i => s"__ss$i"): _*)
  }

  /** Exact per-group percentiles WITHOUT the value-buffering funnel.
    *
    * Spark's `percentile` aggregate is an ObjectHashAggregate whose
    * buffer is a value→count map of the group's entire distinct-value
    * set, and whose final merge has exactly as many tasks as there are
    * groups: over a low-cardinality group key (`l_returnflag` has 3
    * values) that is a 3-task memory funnel whose per-task state grows
    * with the corpus. This computes the identical result from the
    * group-wise ORDER STATISTICS instead:
    *
    *   1. global rank over (strata ++ value ++ tiebreak) via
    *      [[globalRowNumber]] — fully distributed (range partition,
    *      per-partition window, broadcast offsets);
    *   2. per-group `(first_rank, n)` — a map-side-combinable count,
    *      group-cardinality rows, broadcast back (null-safe, so NULL
    *      strata keep percentile's per-group behavior);
    *   3. for each requested p, h = p·(n−1); only the rows at
    *      within-group ranks floor(h)+1 and ceil(h)+1 survive the
    *      filter — ≤ 2·|ps| rows per group;
    *   4. one tiny final aggregate applies Spark's own interpolation
    *      `(ceil(h)−h)·lo + (h−floor(h))·hi` (with the lo==hi
    *      special case, which the subtraction form gets wrong at
    *      integral h).
    *
    * Bit-compatible with `percentile(value, p)`: identical IEEE ops in
    * the same order (p·(n−1) in double, long ranks, double
    * interpolation), NULL values excluded before ranking exactly as the
    * aggregate excludes them. Rows per task stay bounded by the range
    * partitioning at any corpus size; the only per-group state anywhere
    * is two longs and |ps| accumulators.
    */
  def groupPercentiles(df: DataFrame, strata: Seq[String], value: Column,
                       tiebreak: Seq[Column],
                       ps: Seq[(Double, String)]): DataFrame = {
    require(ps.nonEmpty, "at least one percentile required")
    require(ps.forall { case (p, _) => p >= 0 && p <= 1 },
      s"percentages must be in [0,1], got ${ps.map(_._1)}")
    val rn = "__pct_rn"
    val v = "__pct_v"
    // project to exactly (strata, value, tiebreak) before ranking: the
    // output is per-group percentile rows only, so every other input
    // column would ride the range exchange and the ranked persist just
    // to be dropped (§2.3 project before the exchange)
    val tbNames = tiebreak.indices.map(i => s"__pct_tb$i")
    val base = df.withColumn(v, value.cast("double"))
      .select(strata.map(col) ++ Seq(col(v)) ++
        tiebreak.zip(tbNames).map { case (c, n) => c.as(n) }: _*)
      .filter(col(v).isNotNull)
    val ranked = globalRowNumber(
      base, strata.map(col) ++ Seq(col(v)) ++ tbNames.map(col), rn)
    val stats = ranked.groupBy(strata.map(col): _*)
      .agg(min(col(rn)).as("__first"), count(lit(1)).as("__n"))
    val statsR = broadcast(strata.zipWithIndex.foldLeft(stats) {
      case (d, (c, i)) => d.withColumnRenamed(c, s"__s$i")
    })
    val cond = strata.zipWithIndex
      .map { case (c, i) => ranked(c) <=> statsR(s"__s$i") }
      .reduce(_ && _)
    val joined = ranked.join(statsR, cond)
      .drop(strata.indices.map(i => s"__s$i"): _*)
    val r = col(rn) - col("__first") + 1 // 1-based rank within group
    def h(n: Column, p: Double) = lit(p) * (n - 1).cast("double")
    val needed = ps.map(_._1).map { p =>
      val hh = h(col("__n"), p)
      r === floor(hh) + 1 || r === ceil(hh) + 1
    }.reduce(_ || _)
    val cand = joined.filter(needed)
    val aggs = ps.map { case (p, out) =>
      val hh = h(max(col("__n")), p)
      val lo = floor(hh)
      val hi = ceil(hh)
      val loV = max(when(r === floor(h(col("__n"), p)) + 1, col(v)))
      val hiV = max(when(r === ceil(h(col("__n"), p)) + 1, col(v)))
      when(lo === hi, loV)
        .otherwise((hi - hh) * loV + (hh - lo) * hiV).as(out)
    }
    cand.groupBy(strata.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Each row paired with its SUCCESSOR in the global `order` — the
    * adjacency primitive of the suffix-order LCP statistics
    * ([[Dedup.lcpPerPosition]]) — without materializing a global rank
    * and self-joining on it, which re-shuffles the full payload twice
    * on the rank key (for 128-byte suffix slices on sf0.1 documents:
    * 31 s cold / 12.9 s warm as a rank self-join vs 15 s / 1.5 s here).
    *
    * Same range scheme as [[globalRowNumber]]: within a range partition
    * the successor is a window `lead`, fused with the bookkeeping
    * row_number into ONE WindowExec (one sort; the window adds the
    * same pass-through `__pid` re-clustering exchange every two-pass
    * Prefix window pays — each range partition maps wholly to one
    * reducer);
    * ACROSS a boundary, partition i's last row pairs with the first row
    * of the next non-empty partition — the per-partition first rows are
    * collected (ONE row per partition, tiny at any scale) and broadcast
    * back keyed by predecessor partition id. The globally-last row
    * emits no pair.
    *
    * @param cols payload columns to carry; the result has `cols` plus
    *             `<col>_b` (the successor's values)
    * @param out  optional output projection over cols ++ cols_b,
    *             applied BEFORE the pair relation is materialized — a
    *             reduction here (e.g. two cap-byte slices → one int)
    *             keeps the wide payload out of storage entirely; the
    *             raw payload survives only on the 2·nPartitions
    *             partition-edge rows the boundary stitch reads
    */
  def adjacentPairs(df: DataFrame, order: Seq[Column], cols: Seq[String],
                    out: Seq[Column] = Nil): DataFrame = {
    val spark = df.sparkSession
    val outCols =
      if (out.nonEmpty) out
      else cols.map(col) ++ cols.map(c => col(s"${c}_b"))
    // spread before the range exchange — the [[core]] rationale: the
    // child computes once into spread shuffle files instead of running
    // its sampling pass and shuffle write serially over a one-file scan
    val ranged = Materialize.spread(df).repartitionByRange(order: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    // ONE window pass: every lead plus the bookkeeping exprs share the
    // window spec, so they land in a single WindowExec (one sort). The
    // constant-marker lead is the successor-existence test (a lead over
    // a payload column would be ambiguous if the payload were null).
    val led = cols.foldLeft(
        ranged.withColumn("__has_next", lead(lit(1), 1).over(w))
          .withColumn("__rn", row_number().over(w))) {
      (d, c) => d.withColumn(s"${c}_b", lead(col(c), 1).over(w))
    }
    // what persists: the caller's OUTPUT projection (applied before the
    // materialization, so e.g. two 128-byte suffix slices reduce to one
    // int before anything is stored) plus the raw payload ONLY on
    // partition-edge rows (first/last — 2 rows per partition), which the
    // boundary stitch below needs.
    val edge = col("__rn") === 1 || col("__has_next").isNull
    val kept = Materialize.multiScan(led.select(
      outCols ++ cols.map(c => when(edge, col(c)).as(s"__edge_$c")) ++
        Seq(col("__pid"), col("__rn"), col("__has_next")): _*))
    val outNames = kept.columns.take(outCols.length)
    val inner = kept.filter(col("__has_next").isNotNull)
      .select(outNames.map(col): _*)
    // per-partition first rows -> driver; successor of partition i's last
    // row = first row of the next non-empty partition
    val byPid = kept.filter(col("__rn") === 1)
      .select((col("__pid") +: cols.map(c => col(s"__edge_$c"))): _*)
      .collect().sortBy(_.getInt(0))
    val succRows = byPid.indices.flatMap { i =>
      if (i + 1 < byPid.length) {
        val nxt = byPid(i + 1)
        Some(org.apache.spark.sql.Row.fromSeq(
          byPid(i).getInt(0) +: cols.indices.map(j => nxt.get(j + 1))))
      } else None
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
        cols.map(c => df.schema(c).copy(name = s"${c}_b")))
    val succDf = spark.createDataFrame(
      spark.sparkContext.parallelize(succRows, 1), schema)
    // the boundary relation re-exposes cols/cols_b, so the SAME output
    // expressions evaluate on it
    val boundary = kept.filter(col("__has_next").isNull)
      .select((cols.map(c => col(s"__edge_$c").as(c)) :+ col("__pid")): _*)
      .join(broadcast(succDf), Seq("__pid"))
      .select(outCols: _*)
    inner.unionByName(boundary)
  }

  private def core(df: DataFrame, order: Seq[Column], value: Option[Column],
                   out: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = value.fold(df)(v => df.withColumn("__v", v))
    // the nondeterministic-flagged spark_partition_id is bound as a real
    // attribute in a projection (legal), then grouped/windowed BY attribute
    //
    // spread BEFORE the range exchange (no-op on well-partitioned
    // inputs): range partitioning executes its child twice — a sampling
    // pass and the shuffle write — and a narrow child over a one-file
    // scan runs BOTH serially in one task. With the round-robin exchange
    // in between, the child computes once into spread shuffle files and
    // the sampling + write are 32-way reads of those files.
    val ranged = Materialize.multiScan(
      Materialize.spread(base).repartitionByRange(order: _*)
        .withColumn("__pid", spark_partition_id()))
    // subtotals stay in the value's numeric family: integral sums (and
    // row counts) in long, fractional sums in double — a long cast here
    // would silently truncate fractional running sums. (Decimal values
    // ride the double path; use an integral/double column where exact
    // decimal semantics matter.)
    val fractional = value.isDefined && (base.schema("__v").dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType |
           (_: org.apache.spark.sql.types.DecimalType) => true
      case _ => false
    })
    val subCast = if (fractional) "double" else "long"
    val subAgg = value.fold(count(lit(1)))(_ => sum(col("__v")))
    val subRows = ranged.groupBy(col("__pid"))
      .agg(subAgg.cast(subCast).as("__sub")).collect()
    val nParts = if (subRows.isEmpty) 0 else subRows.map(_.getInt(0)).max + 1
    // offsets(p) = sum of subtotals of all partitions before p —
    // accumulated in the value's own type (long stays exact past 2^53)
    val offDf =
      if (fractional) {
        val subs = subRows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
        (0 until nParts).scanLeft(0.0)((acc, p) => acc + subs.getOrElse(p, 0.0))
          .take(math.max(nParts, 1))
          .zipWithIndex.map { case (o, p) => (p, o) }.toDF("__pid", "__off")
      } else {
        val subs = subRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
        (0 until nParts).scanLeft(0L)((acc, p) => acc + subs.getOrElse(p, 0L))
          .take(math.max(nParts, 1))
          .zipWithIndex.map { case (o, p) => (p, o) }.toDF("__pid", "__off")
      }
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val local = value.fold(row_number().over(w).cast("long"))(_ =>
      sum(col("__v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ranged.join(broadcast(offDf), Seq("__pid"))
      .withColumn(out, local + col("__off"))
      .drop("__pid", "__off", "__v")
  }
}
