package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit: violation predicates are evaluated as
  * conditional-count aggregate expressions in ONE scan — no per-check
  * passes, no driver loops — so an audit costs the same as a single
  * aggregate regardless of how many checks it carries.
  */
object DataQuality {

  /** A named expectation; `violation` is true on rows that BREAK it. */
  final case class Check(name: String, violation: Column)

  def notNull(name: String, c: Column): Check = Check(name, c.isNull)
  def inRange(name: String, c: Column, lo: Double, hi: Double): Check =
    Check(name, c.isNull || c < lo || c > hi)
  def matches(name: String, c: Column, pattern: String): Check =
    Check(name, c.isNull || !c.rlike(pattern))

  /** One row: total row count plus one violation-count column per check.
    * Add `uniqueKeyCols` to also count duplicate-key rows (computed as
    * count - approxless exact distinct in the same aggregate).
    */
  def audit(df: DataFrame, checks: Seq[Check],
            uniqueKeyCols: Seq[String] = Nil): DataFrame = {
    val base: Seq[Column] = count(lit(1)).as("n_rows") +:
      checks.map(c => count(when(c.violation, 1)).as(c.name))
    val all = if (uniqueKeyCols.isEmpty) base
      else base :+ (count(lit(1)) -
        countDistinct(uniqueKeyCols.head, uniqueKeyCols.tail: _*)).as("n_dup_key")
    df.agg(all.head, all.tail: _*)
  }

  /** Population Stability Index between a REFERENCE and a CURRENT
    * snapshot of a numeric column — the standard production drift
    * monitor (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25 major shift):
    *
    *   PSI = Σ_b (p_cur(b) − p_ref(b)) · ln(p_cur(b) / p_ref(b))
    *
    * Buckets are the REFERENCE quantiles (the convention that makes the
    * reference distribution uniform over buckets), computed EXACTLY by
    * [[Prefix.groupPercentiles]] — distributed rank, Spark's
    * interpolation formula, no value-buffering percentile aggregate —
    * so an oracle replaying that formula over the sorted reference
    * reproduces the edges bit-for-bit. The nBuckets−1 edge values
    * (tiny at any scale) come to the driver and fold into a literal
    * when-chain, so bucket assignment is a stateless scan projection
    * on both snapshots; everything after is nBuckets-row arithmetic.
    *
    * Empty buckets (possible under heavy drift or duplicated edge
    * values) are clamped: fractions floor at `epsilon` before the log,
    * the standard PSI guard — deterministic, documented, mirrored by
    * the oracle. Per-bucket contributions are reported in integer
    * MICRO-units (floor(x·10⁶ + 0.5)) so the cross-engine sum is exact
    * integer arithmetic, never an accumulation-order-sensitive double
    * sum.
    *
    * @return one row per bucket 1..nBuckets (0-count buckets kept):
    *         (bucket, n_ref, n_cur, psi_x1e6); total PSI =
    *         Σ psi_x1e6 / 1e6. An EMPTY current snapshot yields NULL
    *         psi_x1e6 in every bucket — the batch analogue of
    *         [[psiTick]]'s NaN: with no current distribution there is
    *         no drift signal, and reporting 0 (what the unguarded
    *         0/0 → NaN → floor-cast arithmetic produced) would be the
    *         spurious all-clear a monitor must never emit. An empty
    *         (or all-null) REFERENCE throws: a drift monitor without a
    *         reference distribution is a configuration error, not a
    *         measurement.
    */
  /** Frozen reference profile for the STREAMING drift monitor: the
    * reference deciles and fractions computed ONCE (at stream startup,
    * like the admission stage's frozen score tables), then applied to
    * every micro-batch by [[psiTick]] as a stateless scan + one tiny
    * aggregate — no store, no state growth, per-tick cost = batch scan.
    * The edge list is nBuckets−1 doubles: it broadcasts trivially at
    * any scale.
    */
  final case class PsiProfile(edges: Seq[Double], refFrac: Seq[Double],
                              epsilon: Double) {
    require(refFrac.length == edges.length + 1,
      "profile shape: nBuckets fractions, nBuckets-1 edges")
  }

  /** Build a [[PsiProfile]] from the reference snapshot — the same
    * exact-decile edges as [[psi]] (Spark's interpolation formula via
    * [[Prefix.groupPercentiles]]) plus the reference bucket fractions.
    */
  def psiProfile(ref: DataFrame, valueCol: Column, nBuckets: Int = 10,
                 epsilon: Double = 1e-6): PsiProfile = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val r1 = ref.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val ps = (1 until nBuckets).map(k => (k.toDouble / nBuckets) -> s"e$k")
    val edgeRow = Prefix.groupPercentiles(
      r1.withColumn("__g", lit(1)).withColumn("__t",
        monotonically_increasing_id()),
      Seq("__g"), col("v"), tiebreak = Seq(col("__t")), ps = ps)
      .collect().headOption.getOrElse(throw new IllegalArgumentException(
        "psiProfile: reference snapshot has no non-null values — " +
          "a drift monitor needs a populated reference distribution"))
    val edges = (1 until nBuckets).map(k => edgeRow.getAs[Double](s"e$k"))
    val bucket = edges.foldLeft(lit(1))((acc, e) =>
      acc + when(col("v") > lit(e), 1).otherwise(0))
    val aggCols = count(lit(1)).as("n") +: (0 until nBuckets).map(i =>
      count(when(col("b") === i + 1, 1)).as(s"c$i"))
    val counts = r1.select(bucket.as("b")).groupBy()
      .agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val total = counts.getLong(0).toDouble
    PsiProfile(edges,
      (0 until nBuckets).map(i => counts.getLong(i + 1) / total), epsilon)
  }

  /** One drift TICK of the streaming monitor: PSI of a micro-batch
    * against the frozen [[PsiProfile]]. Stateless — bucket assignment
    * is a literal when-chain scan projection over the batch, the
    * aggregate is nBuckets conditional counts in ONE pass, and the PSI
    * arithmetic runs on the driver over nBuckets numbers. Returns NaN
    * for an empty batch (no distribution to compare — callers skip the
    * alert rather than reading drift into nothing).
    */
  def psiTick(profile: PsiProfile, batch: DataFrame,
              valueCol: Column): Double = {
    val v = valueCol.cast("double")
    val bucket = profile.edges.foldLeft(lit(1))((acc, e) =>
      acc + when(v > lit(e), 1).otherwise(0))
    val aggCols = count(lit(1)).as("n") +:
      profile.refFrac.indices.map(i =>
        count(when(col("b") === i + 1, 1)).as(s"c$i"))
    val counts = batch.filter(v.isNotNull)
      .select(bucket.as("b"))
      .groupBy().agg(aggCols.head, aggCols.tail: _*)
      .collect()(0)
    val n = counts.getLong(0)
    if (n == 0L) Double.NaN
    else profile.refFrac.indices.map { i =>
      val fc = math.max(counts.getLong(i + 1).toDouble / n, profile.epsilon)
      val fr = math.max(profile.refFrac(i), profile.epsilon)
      (fc - fr) * math.log(fc / fr)
    }.sum
  }

  /** Drift TIME SERIES against the frozen profile — the batch/backfill
    * complement of [[psiTick]]: one PSI per PERIOD of `periodCol`
    * (hour, day — any grouping expression), answering "WHEN did the
    * distribution move" over historical data, where the tick only
    * answers "is this batch drifted now". Same frozen-edges bucket
    * chain, epsilon clamp, and integer-micro convention as [[psi]],
    * so a SQL replay of the profile build + the per-period formula
    * hash-matches.
    *
    * Scale: ONE scan — bucket assignment is the stateless literal
    * when-chain, then a single groupBy(period) with nBuckets+1
    * conditional counts (map-side collapsible); the PSI arithmetic is
    * a projection over the period-cardinality aggregate, with the
    * frozen reference fractions embedded as literals. No join, no
    * second pass over the data.
    *
    * Periods with zero non-null rows produce NO row (there is no
    * distribution to score — the series analogue of [[psiTick]]'s
    * NaN; emitting psi=0 would be the spurious all-clear).
    *
    * Pick the period so each slice holds enough rows: PSI over a
    * handful of samples is sampling noise, not drift (a period with
    * n ≈ nBuckets rows cannot populate the buckets evenly even when
    * nothing moved). `n_cur` rides along per row precisely so alert
    * rules can gate on it.
    *
    * @return (period, n_cur, psi_x1e6) — total PSI of the period's
    *         slice in integer micro-units
    */
  def psiSeries(profile: PsiProfile, df: DataFrame, valueCol: Column,
                periodCol: Column,
                periodName: String = "period"): DataFrame = {
    val nB = profile.refFrac.length
    val base = df.select(periodCol.as(periodName),
        valueCol.cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val bucket = profile.edges.foldLeft(lit(1))((acc, e) =>
      acc + when(col("__v") > lit(e), 1).otherwise(0))
    val aggCols = count(lit(1)).as("n_cur") +: (0 until nB).map(i =>
      count(when(bucket === i + 1, 1)).as(s"__c$i"))
    val grouped = base.groupBy(col(periodName))
      .agg(aggCols.head, aggCols.tail: _*)
    val contribs = (0 until nB).map { i =>
      val fc = greatest(col(s"__c$i").cast("double") / col("n_cur"),
        lit(profile.epsilon))
      val fr = lit(math.max(profile.refFrac(i), profile.epsilon))
      floor((fc - fr) * log(fc / fr) * 1e6 + 0.5).cast("long")
    }
    grouped.select(col(periodName), col("n_cur"),
      contribs.reduce(_ + _).as("psi_x1e6"))
  }

  /** CATEGORICAL PSI — the same frozen-profile drift monitor over a
    * STRING column. Text pipelines drift first in categorical space
    * (language mix, source mix, vocabulary) long before any numeric
    * column moves; this is the drift signal a corpus monitor must see
    * first. Buckets are the reference's top-K categories (by count,
    * ties broken to the lexicographically SMALLER category —
    * deterministic, oracle-replayable) plus one OTHER bucket rolling
    * up the tail, so the bucket count is bounded regardless of
    * category cardinality — the property that makes the monitor safe
    * over open vocabularies at any scale. Same epsilon clamp and
    * integer-micro convention as the numeric [[psi]]; same empty-
    * snapshot semantics (empty current → NULL psi, empty reference →
    * throw). NULL category rows are excluded like NULL values.
    */
  final case class CatPsiProfile(categories: Seq[String],
                                 refFrac: Seq[Double], epsilon: Double) {
    require(refFrac.length == categories.length + 1,
      "profile shape: one fraction per category plus OTHER")
  }

  /** The OTHER-bucket label: reference top-K membership is frozen into
    * the profile, so anything else — including categories unseen at
    * profile time — lands here. SENTINEL COLLISION: a real category
    * whose value IS this string conflates with the roll-up — in both
    * engines identically (the oracle uses the same CASE), so hashes
    * never diverge, but the monitor then can't tell that category's
    * drift from tail drift. Rename the sentinel via the data (or
    * prefix the column) if your category space can contain it;
    * `DataQualitySpec` pins the conflation so the behavior is a
    * documented contract, not a surprise. */
  val CatOther = "__other__"

  private def catTopK(ref: DataFrame, catCol: Column,
                      topK: Int): (DataFrame, Seq[String]) = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val r1 = ref.select(catCol.cast("string").as("c"))
      .filter(col("c").isNotNull)
    val cats = r1.groupBy(col("c")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("c").asc).limit(topK)
      .collect().map(_.getString(0)).toSeq
    require(cats.nonEmpty,
      "catPsi: reference snapshot has no non-null categories — " +
        "a drift monitor needs a populated reference distribution")
    (r1, cats)
  }

  private def catBucket(c: Column, cats: Seq[String]): Column =
    when(c.isin(cats: _*), c).otherwise(lit(CatOther))

  /** Build a [[CatPsiProfile]] (stream-startup freeze, like
    * [[psiProfile]]): top-K categories + their reference fractions +
    * the OTHER fraction. */
  def catPsiProfile(ref: DataFrame, catCol: Column, topK: Int = 20,
                    epsilon: Double = 1e-6): CatPsiProfile = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val (r1, cats) = catTopK(ref, catCol, topK)
    val aggCols = count(lit(1)).as("n") +: (cats :+ CatOther).map(c =>
      count(when(col("b") === c, 1)).as(s"c_$c"))
    val counts = r1.select(catBucket(col("c"), cats).as("b"))
      .groupBy().agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val total = counts.getLong(0).toDouble
    CatPsiProfile(cats,
      (1 to cats.length + 1).map(i => counts.getLong(i) / total), epsilon)
  }

  /** One categorical drift TICK against the frozen profile — stateless
    * scan + one tiny aggregate per micro-batch, NaN on an empty batch
    * (mirror of [[psiTick]]). */
  def catPsiTick(profile: CatPsiProfile, batch: DataFrame,
                 catCol: Column): Double = {
    val buckets = profile.categories :+ CatOther
    val aggCols = count(lit(1)).as("n") +: buckets.map(c =>
      count(when(col("b") === c, 1)).as(s"c_$c"))
    val counts = batch.select(catCol.cast("string").as("c"))
      .filter(col("c").isNotNull)
      .select(catBucket(col("c"), profile.categories).as("b"))
      .groupBy().agg(aggCols.head, aggCols.tail: _*)
      .collect()(0)
    val n = counts.getLong(0)
    if (n == 0L) Double.NaN
    else profile.refFrac.indices.map { i =>
      val fc = math.max(counts.getLong(i + 1).toDouble / n, profile.epsilon)
      val fr = math.max(profile.refFrac(i), profile.epsilon)
      (fc - fr) * math.log(fc / fr)
    }.sum
  }

  /** Categorical drift TIME SERIES — [[psiSeries]]' sibling over a
    * STRING column against the frozen [[CatPsiProfile]]: one PSI per
    * period, buckets = the frozen top-K categories + OTHER (unseen
    * categories land in OTHER, so a period full of brand-new
    * categories reads as the major shift it is). Same one-scan shape
    * as the numeric series (stateless bucket CASE, one
    * groupBy(period) of conditional counts, literal-embedded reference
    * fractions), same absent-period and small-n semantics.
    */
  def catPsiSeries(profile: CatPsiProfile, df: DataFrame, catCol: Column,
                   periodCol: Column,
                   periodName: String = "period"): DataFrame = {
    val buckets = profile.categories :+ CatOther
    val base = df.select(periodCol.as(periodName),
        catCol.cast("string").as("__c"))
      .filter(col("__c").isNotNull)
      .select(col(periodName), catBucket(col("__c"), profile.categories)
        .as("__b"))
    val aggCols = count(lit(1)).as("n_cur") +: buckets.zipWithIndex.map {
      case (c, i) => count(when(col("__b") === c, 1)).as(s"__c$i")
    }
    val grouped = base.groupBy(col(periodName))
      .agg(aggCols.head, aggCols.tail: _*)
    val contribs = profile.refFrac.indices.map { i =>
      val fc = greatest(col(s"__c$i").cast("double") / col("n_cur"),
        lit(profile.epsilon))
      val fr = lit(math.max(profile.refFrac(i), profile.epsilon))
      floor((fc - fr) * log(fc / fr) * 1e6 + 0.5).cast("long")
    }
    grouped.select(col(periodName), col("n_cur"),
      contribs.reduce(_ + _).as("psi_x1e6"))
  }

  /** Batch-form categorical PSI (the oracle-shaped sibling of [[psi]]):
    * one row per bucket — the reference's top-K categories in frequency
    * order plus OTHER — with counts from both snapshots and the
    * integer-micro contribution. */
  def catPsi(ref: DataFrame, cur: DataFrame, catCol: Column,
             topK: Int = 20, epsilon: Double = 1e-6): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val spark = ref.sparkSession
    import spark.implicits._
    val (r1, cats) = catTopK(ref, catCol, topK)
    val c1 = cur.select(catCol.cast("string").as("c"))
      .filter(col("c").isNotNull)
    def counts(df: DataFrame, out: String): DataFrame =
      df.groupBy(catBucket(col("c"), cats).as("category"))
        .agg(count(lit(1)).as(out))
    val buckets = (cats :+ CatOther).toDF("category")
    val joined = buckets
      .join(counts(r1, "n_ref"), Seq("category"), "left")
      .join(counts(c1, "n_cur"), Seq("category"), "left")
      .select(col("category"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("tr"),
      sum(col("n_cur")).as("tc"))
    val fr = greatest(col("n_ref").cast("double") / col("tr"), lit(epsilon))
    val fc = greatest(col("n_cur").cast("double") / col("tc"), lit(epsilon))
    joined.crossJoin(broadcast(tot))
      .select(col("category"), col("n_ref"), col("n_cur"),
        when(col("tc") === 0, lit(null).cast("long"))
          .otherwise(floor((fc - fr) * log(fc / fr) * 1e6 + 0.5)
            .cast("long"))
          .as("psi_x1e6"))
  }

  def psi(ref: DataFrame, cur: DataFrame, valueCol: Column,
          nBuckets: Int = 10, epsilon: Double = 1e-6): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val spark = ref.sparkSession
    val r1 = ref.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val c1 = cur.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val ps = (1 until nBuckets).map(k => (k.toDouble / nBuckets) -> s"e$k")
    // any unique tiebreak works: the values picked at the quantile
    // ranks depend only on the sorted value order, not on how ties are
    // broken within equal values
    val edgeRow = Prefix.groupPercentiles(
      r1.withColumn("__g", lit(1)).withColumn("__t",
        monotonically_increasing_id()),
      Seq("__g"), col("v"), tiebreak = Seq(col("__t")), ps = ps)
      .collect().headOption.getOrElse(throw new IllegalArgumentException(
        "psi: reference snapshot has no non-null values — " +
          "a drift monitor needs a populated reference distribution"))
    val edges = (1 until nBuckets).map(k => edgeRow.getAs[Double](s"e$k"))
    def bucketOf(v: Column): Column =
      edges.foldLeft(lit(1))((acc, e) =>
        acc + when(v > lit(e), 1).otherwise(0))
    def counts(df: DataFrame, out: String): DataFrame =
      df.groupBy(bucketOf(col("v")).as("bucket"))
        .agg(count(lit(1)).as(out))
    val buckets = spark.range(1, nBuckets + 1)
      .select(col("id").cast("int").as("bucket"))
    val joined = buckets
      .join(counts(r1, "n_ref"), Seq("bucket"), "left")
      .join(counts(c1, "n_cur"), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum(col("n_ref")).as("tr"),
      sum(col("n_cur")).as("tc"))
    val fr = greatest(col("n_ref").cast("double") / col("tr"), lit(epsilon))
    val fc = greatest(col("n_cur").cast("double") / col("tc"), lit(epsilon))
    joined.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        // tc=0 (empty current) would make n_cur/tc NaN, and
        // greatest(NaN, eps) is NaN in Spark, whose floor-cast is 0 —
        // exactly the spurious zero-drift signal psiTick guards
        // against with NaN. NULL is the batch-form equivalent.
        when(col("tc") === 0, lit(null).cast("long"))
          .otherwise(floor((fc - fr) * log(fc / fr) * 1e6 + 0.5)
            .cast("long"))
          .as("psi_x1e6"))
  }

  /** Referential-integrity audit between a child (foreign-key) and a
    * parent (primary-key) relation — the constraint class [[audit]]'s
    * row-local checks cannot express (a violation here is the ABSENCE
    * of a matching row elsewhere). One row per call:
    * (relation, n_child, n_null_fk, n_orphan, orphan_ppm) where
    * `n_orphan` counts child rows whose non-null key has no parent and
    * `n_null_fk` counts null keys separately (a null FK is a
    * completeness question, not a dangling reference — conflating them
    * hides which problem you have).
    *
    * Scale: the child collapses to per-key counts FIRST (map-side
    * partial aggregate — the shuffle carries distinct keys, never child
    * rows), joins the parent's distinct keys, and folds to one row via
    * a partial-then-merge aggregate. Nothing wider than a key ever
    * crosses an exchange. `orphan_ppm` is exact integer arithmetic
    * (floor(n_orphan·10⁶ / n_child)) so the row hash-matches any
    * engine.
    */
  def refIntegrity(child: DataFrame, childKey: Column,
                   parent: DataFrame, parentKey: Column,
                   relation: String): DataFrame = {
    val fkCounts = child.select(childKey.as("__fk"))
      .groupBy(col("__fk")).agg(count(lit(1)).as("__n"))
    val pks = parent.select(parentKey.as("__pk")).distinct()
    fkCounts.join(pks, col("__fk") === col("__pk"), "left")
      .agg(
        coalesce(sum(col("__n")), lit(0L)).as("n_child"),
        coalesce(sum(when(col("__fk").isNull, col("__n"))
          .otherwise(lit(0L))), lit(0L)).as("n_null_fk"),
        coalesce(sum(when(col("__fk").isNotNull && col("__pk").isNull,
          col("__n")).otherwise(lit(0L))), lit(0L)).as("n_orphan"))
      .select(lit(relation).as("relation"), col("n_child"),
        col("n_null_fk"), col("n_orphan"),
        // SQL `div`: exact integer division (double `/`+floor rounds
        // once the numerator passes 2^53 — reachable at real scale)
        when(col("n_child") > 0,
          expr("(n_orphan * 1000000) div n_child"))
          .otherwise(lit(0)).cast("long").as("orphan_ppm"))
  }

  /** Robust per-group outlier summary via the median absolute deviation
    * — the standard-deviation rule's heavy-tail-safe replacement (one
    * extreme value drags a mean/stddev fence toward itself; the median
    * and MAD are 50%-breakdown estimators, so the fence holds):
    * a row is an outlier when |x − median| > k·MAD.
    *
    * Both the median and the MAD are EXACT distributed percentiles
    * ([[Prefix.groupPercentiles]] — range-partitioned rank, Spark's
    * interpolation formula, no value-buffering aggregate), so the whole
    * summary replays bit-for-bit in any engine that reproduces the
    * interpolation. Two rank passes over the data (median, then the
    * deviations' median) — the honest price of an exact MAD; the
    * per-group medians ride between passes as a group-cardinality
    * broadcast join. Rows with a NULL value are excluded from both
    * estimation and outlier counting (a missing measurement is a
    * completeness finding for [[audit]], not a distance).
    *
    * @return one row per group: (strata..., n, med, mad, n_outliers) —
    *         `med`/`mad` unrounded (callers round for hashing)
    */
  def madOutliers(df: DataFrame, strata: Seq[String], value: Column,
                  tiebreak: Seq[Column], k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val v = df.filter(value.isNotNull)
    val med = Prefix.groupPercentiles(v, strata, value.cast("double"),
      tiebreak, ps = Seq(0.5 -> "med"))
    val dev = v.join(broadcast(med), strata)
      .withColumn("__dev", abs(value.cast("double") - col("med")))
    val mad = Prefix.groupPercentiles(dev, strata, col("__dev"),
      tiebreak, ps = Seq(0.5 -> "mad"))
    dev.join(broadcast(mad), strata)
      .groupBy(strata.map(col): _*)
      .agg(count(lit(1)).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        count(when(col("__dev") > lit(k) * col("mad"), 1))
          .as("n_outliers"))
  }

  /** Tabular CUSUM changepoint detection over an already-aggregated
    * integer period series — the sequential-detection complement of
    * [[psiSeries]] (PSI asks "did the DISTRIBUTION move vs a frozen
    * profile"; CUSUM asks "did the LEVEL sustain a shift, and when",
    * accumulating small persistent deviations a per-period threshold
    * test misses). Standard two-sided form (Page 1954): with drift
    * allowance κ around target μ,
    *
    *   s⁺_t = max(0, s⁺_{t−1} + (x_t − μ − κ)),  alarm when s⁺ > h
    *   s⁻_t = max(0, s⁻_{t−1} + (μ − x_t − κ))   (downward twin)
    *
    * The recursion is computed by its CLOSED FORM
    * s_t = S_t − min(0, min_{j≤t} S_j) over prefix sums
    * S_t = Σ_{i≤t} d_i — two stacked running aggregates instead of a
    * sequential fold, so the whole detector is window arithmetic. All
    * quantities are exact integers (μ, κ, h are integer dials in the
    * metric's own units), so the series hash-matches any engine.
    *
    * Scale: the input is a per-period AGGREGATE — cardinality is the
    * number of periods (time-bounded), not the row count — so the
    * unkeyed windows here sort a bounded relation by construction.
    * [[cusumCounts]] builds that aggregate from an event stream in one
    * map-side-collapsible pass.
    *
    * @return the series plus (cusum_pos, cusum_neg, alarm_up,
    *         alarm_down)
    */
  def cusum(series: DataFrame, orderCol: Column, value: Column,
            mu: Long, kappa: Long, h: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(kappa >= 0, s"kappa must be >= 0, got $kappa")
    require(h > 0, s"h must be > 0, got $h")
    val w = Window.orderBy(orderCol)
    val v = value.cast("long")
    val s1 = series
      .withColumn("__sp", sum(v - lit(mu) - lit(kappa)).over(w))
      .withColumn("__sn", sum(lit(mu) - v - lit(kappa)).over(w))
    s1.withColumn("cusum_pos",
        col("__sp") - least(min(col("__sp")).over(w), lit(0L)))
      .withColumn("cusum_neg",
        col("__sn") - least(min(col("__sn")).over(w), lit(0L)))
      .withColumn("alarm_up", col("cusum_pos") > h)
      .withColumn("alarm_down", col("cusum_neg") > h)
      .drop("__sp", "__sn")
  }

  /** Table profiling card — per-column completeness and cardinality in
    * ONE scan (the summary every DQ tool opens with, and the input to
    * choosing keys, partition columns, and [[refIntegrity]] targets):
    * one row per column with exact null count/ppm and the distinct
    * count.
    *
    * Two modes, because exact multi-column distincts have a real
    * plan cost: `approx = false` (default, the oracle-matched gate
    * mode) uses exact `countDistinct` per column — Spark plans n
    * distinct aggregates as an Expand of the scan (each row
    * replicated once per distinct-aggregate, partially aggregated
    * map-side), an n_cols× scan-side blowup that is fine for a
    * profiling pass over a handful of columns but is the documented
    * price; `approx = true` swaps in `approx_count_distinct`
    * (HLL++, rsd 5%) — regular single-pass aggregates, no Expand,
    * the 100 TB mode (estimates are engine-internal, so that mode is
    * spec-checked against the exact mode's counts within the rsd
    * bound rather than oracle-hashed — the q_hll convention).
    *
    * @return one row per column, in the given order: (column, n_rows,
    *         n_null, null_ppm, n_distinct) — n_distinct counts
    *         non-null values
    */
  def profile(df: DataFrame, cols: Seq[String],
              approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).isNull, 1)).as(s"__null_$c"),
        (if (approx) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__nd_$c"))
    } :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'${c.replace("'", "''")}', __null_$c, __nd_$c").mkString(", ")
    row.select(expr(s"stack(${cols.length}, $stackArgs) " +
        "AS (column, n_null, n_distinct)"), col("__rows"))
      .select(col("column"), col("__rows").as("n_rows"), col("n_null"),
        when(col("__rows") > 0, expr("(n_null * 1000000) div __rows"))
          .otherwise(lit(0)).cast("long").as("null_ppm"),
        col("n_distinct"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic between a reference
    * and a current snapshot — the distribution test with no dials at
    * all, completing the monitor family (PSI needs a bucket count and
    * an epsilon; KS is D = sup_x |F_ref(x) − F_cur(x)|, parameter-free
    * and sensitive to ANY distributional difference, not just
    * bucket-visible mass moves).
    *
    * Exactness: the sup over the pooled distinct values of
    * |C_ref·n_cur − C_cur·n_ref| — cross-multiplied integer CDF
    * numerators, so no float division happens before the final scaled
    * report. Computed as ONE range-partitioned running sum over the
    * per-distinct-value signed jump d_v = n_ref(v)·n_cur − n_cur(v)·n_ref
    * ([[Prefix.globalRunningSum]] — the running total IS
    * C_ref·n_cur − C_cur·n_ref, evaluated after each value's whole
    * jump, which is where the sup of a right-continuous step
    * difference lives; ties jump both CDFs together by construction).
    * Shape: one distinct-value aggregate (map-side collapsible) + one
    * range exchange over DISTINCT values + one max — nothing buffers a
    * sample.
    *
    * `ks_x1e6` = floor(ks_num·10⁶ / (n_ref·n_cur)) in DECIMAL(38)
    * arithmetic (exact to n_ref·n_cur ~ 10³⁰ — long arithmetic would
    * overflow at ~3·10⁶ rows per side). D > 1.63·√((n1+n2)/(n1·n2))
    * rejects at α=0.01 under the classical asymptotic, but as with
    * [[psi]] the operator reports the statistic and leaves the alert
    * threshold to the caller.
    *
    * Empty/all-null current snapshot → NULL ks columns (the
    * no-spurious-all-clear convention shared with [[psi]]); empty
    * reference throws.
    *
    * @return one row: (n_ref, n_cur, ks_num, ks_x1e6)
    */
  def ksTest(ref: DataFrame, cur: DataFrame, valueCol: Column): DataFrame = {
    val r = ref.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .select(col("v"), lit(1L).as("__r"), lit(0L).as("__c"))
    val c = cur.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .select(col("v"), lit(0L).as("__r"), lit(1L).as("__c"))
    val byV = r.unionByName(c).groupBy(col("v"))
      .agg(sum(col("__r")).as("nr"), sum(col("__c")).as("nc"))
    val tot = byV.agg(coalesce(sum(col("nr")), lit(0L)),
      coalesce(sum(col("nc")), lit(0L))).head()
    val (n1, n2) = (tot.getLong(0), tot.getLong(1))
    require(n1 > 0, "ksTest: reference snapshot has no non-null values" +
      " — a drift monitor needs a populated reference distribution")
    if (n2 == 0) {
      val spark = ref.sparkSession
      import spark.implicits._
      return Seq((n1, 0L)).toDF("n_ref", "n_cur")
        .select(col("n_ref"), col("n_cur"),
          lit(null).cast("long").as("ks_num"),
          lit(null).cast("long").as("ks_x1e6"))
    }
    val signed = byV.select(col("v"),
      (col("nr") * n2 - col("nc") * n1).as("__d"))
    Prefix.globalRunningSum(signed, Seq(col("v")), col("__d"), "__s")
      .agg(max(abs(col("__s"))).as("ks_num"))
      .select(lit(n1).as("n_ref"), lit(n2).as("n_cur"), col("ks_num"),
        expr(s"CAST((CAST(ks_num AS DECIMAL(38,0)) * 1000000) DIV " +
          s"(CAST(${n1}L AS DECIMAL(38,0)) * ${n2}L) AS BIGINT)")
          .as("ks_x1e6"))
  }

  /** Per-slice [[ksTest]] — the drift RANKING card: one exact KS
    * statistic per slice (source, language, event type), each slice's
    * current distribution against the SAME slice's reference
    * distribution, so "which slice drifted" is answered in one pass
    * instead of one job per slice. The aggregate-level monitors can
    * miss a drift confined to a small slice (diluted below any global
    * threshold); this is where it shows first.
    *
    * Same exact cross-multiplied integer form as [[ksTest]], with the
    * running sum as a SLICE-KEYED window (each slice's sort is
    * per-partition work — scale-safe, no unkeyed sort) and per-slice
    * totals riding a broadcast join. Slices empty on either side
    * report NULL ks (a vanished or brand-new slice is an alert, not a
    * zero — the shared no-spurious-all-clear convention).
    *
    * @return one row per slice: (slice, n_ref, n_cur, ks_num, ks_x1e6)
    */
  def ksBySlice(ref: DataFrame, cur: DataFrame, valueCol: Column,
                sliceCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def side(df: DataFrame, r: Long, c: Long) =
      df.select(sliceCol.cast("string").as("slice"),
        valueCol.cast("double").as("v"))
        .filter(col("slice").isNotNull && col("v").isNotNull)
        .select(col("slice"), col("v"), lit(r).as("__r"), lit(c).as("__c"))
    val byV = side(ref, 1L, 0L).unionByName(side(cur, 0L, 1L))
      .groupBy(col("slice"), col("v"))
      .agg(sum(col("__r")).as("nr"), sum(col("__c")).as("nc"))
    val totals = byV.groupBy(col("slice"))
      .agg(sum(col("nr")).as("n_ref"), sum(col("nc")).as("n_cur"))
    val w = Window.partitionBy(col("slice")).orderBy(col("v"))
    byV.join(broadcast(totals), Seq("slice"))
      .withColumn("__s",
        sum(col("nr") * col("n_cur") - col("nc") * col("n_ref")).over(w))
      .groupBy(col("slice"))
      .agg(first(col("n_ref")).as("n_ref"),
        first(col("n_cur")).as("n_cur"),
        max(abs(col("__s"))).as("__num"))
      .select(col("slice"), col("n_ref"), col("n_cur"),
        when(col("n_ref") > 0 && col("n_cur") > 0, col("__num"))
          .cast("long").as("ks_num"),
        when(col("n_ref") > 0 && col("n_cur") > 0,
          expr("CAST((CAST(__num AS DECIMAL(38,0)) * 1000000) DIV " +
            "(CAST(n_ref AS DECIMAL(38,0)) * n_cur) AS BIGINT)"))
          .as("ks_x1e6"))
  }

  /** Streaming CUSUM accumulator — the ENTIRE cross-tick state of the
    * detector is these two longs, carried by the caller across
    * foreachBatch invocations (a driver var for a session-scoped
    * monitor; alongside the batch ledger for a restart-safe one —
    * either way, nothing resembling a state store). */
  final case class CusumState(sp: Long, sn: Long) {
    require(sp >= 0 && sn >= 0, "CUSUM accumulators are never negative")
  }

  /** One CUSUM step — the streaming member of the [[cusum]] family,
    * completing the monitor matrix the PSI family set (batch / series /
    * tick): per micro-batch, the caller reduces the batch to its period
    * metric (a count, an error tally — ONE aggregate) and advances the
    * recursion in O(1). Unlike [[psiTick]], the state is not a frozen
    * profile but the live accumulator pair — CUSUM's memory IS the
    * detector, which is why it catches slow sustained shifts a
    * stateless per-batch threshold never accumulates.
    *
    * Exactly the recursion [[cusum]] computes in closed form, so a
    * fold of ticks over the period series reproduces the batch
    * column-for-column (spec-pinned).
    *
    * @return (advanced state, alarm_up, alarm_down)
    */
  def cusumTick(state: CusumState, x: Long, mu: Long, kappa: Long,
                h: Long): (CusumState, Boolean, Boolean) = {
    require(kappa >= 0, s"kappa must be >= 0, got $kappa")
    require(h > 0, s"h must be > 0, got $h")
    val sp = math.max(0L, state.sp + (x - mu - kappa))
    val sn = math.max(0L, state.sn + (mu - x - kappa))
    (CusumState(sp, sn), sp > h, sn > h)
  }

  /** [[cusum]] over per-period event counts: one map-side-collapsible
    * count aggregate (epoch periods — no calendar seam between
    * engines), then the closed-form recursion over the bounded period
    * series. */
  def cusumCounts(df: DataFrame, tsMs: Column, periodMs: Long,
                  mu: Long, kappa: Long, h: Long): DataFrame = {
    require(periodMs > 0, s"periodMs must be > 0, got $periodMs")
    // SQL `div` (exact integral division) — Column `/` is double
    // division, which rounds near period boundaries above 2^53
    val series = df.select(tsMs.cast("long").as("__t"))
      .groupBy(expr(s"__t div ${periodMs}L").as("period"))
      .agg(count(lit(1)).as("n"))
    cusum(series, col("period"), col("n"), mu, kappa, h)
  }
}
