package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal relational operators Spark lacks as builtins: as-of join and
  * SCD2 (validity-interval) reconstruction.
  *
  * Both are single-shuffle formulations. The naive as-of join is a range
  * join (`l.k = r.k AND r.t <= l.t` + argmax), which Catalyst executes as
  * an equi-join with a range filter and a per-pair blowup before the
  * argmax prunes; at 100 TB the intermediate is quadratic per key. The
  * union+carry-forward trick below shuffles each side ONCE on the key,
  * sorts within partitions, and resolves the match with a running
  * `last(_, ignoreNulls)` window — linear in the input, no pair blowup,
  * and AQE's skew split still applies to the single exchange.
  */
object Temporal {

  /** For each left row, attach the most recent right row at-or-before the
    * left row's time, matched on `keys`.
    *
    * Right rows must be unique per (keys, rightTime): pre-compact ties
    * (e.g. with [[graft.compact.Compaction.latestPerKey]]) so "the" most
    * recent right row is well-defined — same contract as DuckDB/Pandas
    * ASOF joins, which are nondeterministic under ties.
    *
    * Inner semantics: left rows with no preceding right row are dropped.
    *
    * @param carry right columns to attach, renamed `prefix + name`
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String, carry: Seq[String],
           prefix: String = "r_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val lStruct = struct(leftCols.map(left(_)): _*)
    val l2 = left.select(keys.map(col) ++ Seq(
      col(leftTime).as("__t"), lit(1).as("__src"), lStruct.as("__l")): _*)
      .withColumn("__carry", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          carry.map(c => org.apache.spark.sql.types.StructField(c,
            right.schema(c).dataType, nullable = true)))))
    val r2 = right.select(keys.map(col) ++ Seq(
      col(rightTime).as("__t"), lit(0).as("__src"),
      lit(null).cast(l2.schema("__l").dataType).as("__l"),
      struct(carry.map(col): _*).as("__carry")): _*)
    // right (__src=0) sorts before left (__src=1) at equal times: a right
    // row AT the left row's time is visible — at-or-before semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__m", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1 && col("__m").isNotNull)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        carry.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }

  /** SCD2 reconstruction: turn a change-event stream into validity
    * intervals. Each event's interval runs from its own time to the next
    * event's time for the same key (exclusive); the last event per key is
    * open-ended (`valid_to` = `openEndMs`) and flagged current. One
    * shuffle on the key; `lead` resolves the successor within partitions.
    *
    * @param tiebreak column ordering events at equal times (e.g. offset)
    */
  def scd2(events: DataFrame, keys: Seq[String], timeMs: Column,
           tiebreak: Column, openEndMs: Long = 253402300799999L): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeMs.asc, tiebreak.asc)
    events
      .withColumn("valid_from_ms", timeMs)
      .withColumn("valid_to_ms",
        coalesce(lead(timeMs, 1).over(w), lit(openEndMs)))
      .withColumn("is_current",
        when(lead(timeMs, 1).over(w).isNull, lit(1)).otherwise(lit(0)))
  }

  /** Ordered-sequence FUNNEL: for each entity, the earliest completion
    * time of every prefix of an ordered step pattern — step k completes
    * at the earliest event of type `steps(k-1)` STRICTLY AFTER step
    * k−1's completion (and, when `windowMs` is set, within that window
    * of step 1's time). FIRST-TOUCH semantics: the anchor is the
    * entity's EARLIEST step-1 event. Unwindowed, greedy earliest-match
    * is optimal for sequence containment (matching each step as early
    * as possible maximizes the time available to every later step —
    * exchange argument), so completion is anchor-independent; WITH a
    * window the anchor choice is part of the metric's definition (a
    * later signup could complete where the first one stalls — this
    * operator deliberately reports the first-touch funnel, the
    * standard product-analytics convention).
    *
    * CAVEAT (windowed runs): first-touch anchoring means a reported
    * incomplete does NOT prove no qualifying chain exists — an entity
    * whose completing chain starts at a LATER step-1 event is reported
    * incomplete here even though a within-window chain exists
    * (`TemporalSpec` pins the divergent case). When the question is
    * "does ANY qualifying chain exist" (conversion-eligibility rather
    * than first-touch attribution), use [[funnelAnyTouch]].
    *
    * Shape: one filtered min-aggregate for step 1, then one
    * (join + conditional min-aggregate) round PER STEP — all keyed on
    * the entity, so the rounds reuse one hash partitioning and the
    * per-round state is one timestamp per entity. No per-entity event
    * arrays are ever collected (the collect_list formulation holds a
    * hot entity's whole history in one row — this never does), no
    * window sorts.
    *
    * @param timeMs  event time as epoch millis
    * @param steps   ordered event-type pattern (≥ 1 step)
    * @param windowMs optional max total span: step k counts only if
    *                 t_k ≤ t_1 + windowMs
    * @return (entity, t_1 .. t_n, steps_completed): t_k = epoch-ms
    *         completion time of step k (null once stalled); one row
    *         per entity that completed at least step 1
    */
  def funnel(events: DataFrame, entityCol: String, typeCol: String,
             timeMs: Column, steps: Seq[String],
             windowMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(col(entityCol).as("entity")).agg(min(timeMs).as("t_1"))
    for (k <- 2 to steps.length) {
      val ev = events.filter(col(typeCol) === steps(k - 1))
        .select(col(entityCol).as("entity"), timeMs.as("__tk"))
      val prev = col(s"t_${k - 1}")
      val inWindow = windowMs.fold(lit(true))(w =>
        col("__tk") <= col("t_1") + w)
      val carried = (1 to (k - 1)).map(i => col(s"t_$i"))
      reached = reached.join(ev, Seq("entity"), "left")
        .groupBy((col("entity") +: carried): _*)
        .agg(min(when(col("__tk") > prev && inWindow, col("__tk")))
          .as(s"t_$k"))
    }
    reached.withColumn("steps_completed",
      (1 to steps.length).map(i =>
        when(col(s"t_$i").isNotNull, 1).otherwise(0)).reduce(_ + _))
  }

  /** ANY-TOUCH windowed funnel: does ANY qualifying chain of the
    * ordered step pattern exist for the entity (strictly increasing
    * times, total span ≤ `windowMs`), and when does the earliest one
    * complete? The existence question [[funnel]]'s first-touch
    * anchoring cannot answer (see its caveat).
    *
    * Algorithm — latest-feasible-anchor dynamic programming in ONE
    * window pass, no per-anchor re-matching and no event-array
    * collection: for an event e of type step_k at time t, define
    * L_k(e) = the LATEST step-1 time over all chains step_1 < … <
    * step_k ending at e. Then L_1(e) = t, and L_k(e) = max of
    * L_(k−1) over STRICTLY-earlier step_(k−1) events — a running
    * `max` with a RANGE frame ending 1ms before the current row
    * (strictly-before in TIME, matching [[funnel]]'s strict `>`;
    * equal-timestamp events cannot chain in either operator). A chain
    * ending at e fits the window iff t − L_n(e) ≤ windowMs: since t_n
    * is the chain's maximum, the span constraint reduces to the
    * endpoints, and maximizing the anchor maximizes feasibility —
    * so the check is exact, not heuristic.
    *
    * Shape: one shuffle on the entity, one sort, n−1 stacked running
    * maxes over the SAME window spec (single Window sort, no extra
    * exchanges), then a min-struct aggregate. Scales like any keyed
    * window: no anchor × event blowup (the naive any-touch form
    * re-runs the funnel per step-1 event).
    *
    * @return one row per entity with ≥1 qualifying chain:
    *         (entity, anchor_ms, t_complete_ms) — the earliest
    *         qualifying completion and THAT completion's
    *         latest-feasible anchor
    */
  def funnelAnyTouch(events: DataFrame, entityCol: String,
                     typeCol: String, timeMs: Column, steps: Seq[String],
                     windowMs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col("__e")).orderBy(col("__t"))
      .rangeBetween(Window.unboundedPreceding, -1)
    var df = events.select(col(entityCol).as("__e"),
        col(typeCol).as("__ty"), timeMs.as("__t"))
      .withColumn("__a1", when(col("__ty") === steps.head, col("__t")))
    for (k <- 2 to steps.length) {
      df = df
        .withColumn(s"__m${k - 1}", max(col(s"__a${k - 1}")).over(w))
        .withColumn(s"__a$k",
          when(col("__ty") === steps(k - 1), col(s"__m${k - 1}")))
    }
    val anchor = col(s"__a${steps.length}")
    val inWindow = windowMs.fold(lit(true))(wm =>
      col("__t") - anchor <= wm)
    df.filter(anchor.isNotNull && inWindow)
      .groupBy(col("__e").as("entity"))
      .agg(min(struct(col("__t").as("tc"), anchor.as("anc"))).as("__b"))
      .select(col("entity"), col("__b.anc").as("anchor_ms"),
        col("__b.tc").as("t_complete_ms"))
  }

  /** Cohort retention matrix: entities are cohorted by the absolute
    * period of their FIRST activity (`period = ts div periodMs`, epoch
    * periods — no calendar arithmetic to diverge between engines), and
    * each (cohort, offset) cell reports how many of that cohort were
    * active `offset` periods after their first touch, plus the
    * retention fraction against the cohort's size. The classic
    * product-analytics operator (triangular cohort chart); the
    * reference's surface has nothing temporal beyond per-row timestamp
    * parses, so this extends the `events` family ([[funnel]], SCD2,
    * sessionize).
    *
    * Shape: distinct (entity, period) first — ONE shuffle keyed on the
    * pair collapses per-period event volume (the 100 TB lever: everything
    * after operates on entity×period cardinality, not event cardinality)
    * — then a min-per-entity aggregate, an entity-keyed join attaching
    * cohorts, and a tiny (cohort, offset) aggregate. No windows, no
    * single-partition funnel; output cardinality is cohorts × offsets.
    *
    * Retention is rounded to 4dp (the library's cross-engine float
    * convention) and `offset = 0` rows are retained (always 1.0) as the
    * matrix diagonal.
    *
    * @return (cohort_period, period_offset, n_active, cohort_size,
    *         retention)
    */
  def retentionMatrix(events: DataFrame, entityCol: String, timeMs: Column,
                      periodMs: Long): DataFrame = {
    require(periodMs >= 1, s"periodMs must be >= 1, got $periodMs")
    val up = events.select(col(entityCol).as("__e"),
        timeMs.cast("long").as("__t"))
      // SQL `div` (exact integral division) — Column `/` is double
      // division, which rounds near period boundaries above 2^53
      .select(col("__e"), expr(s"__t div ${periodMs}L").as("__p"))
      .distinct()
    val cohorts = up.groupBy(col("__e"))
      .agg(min(col("__p")).as("__cohort"))
    val sizes = cohorts.groupBy(col("__cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    up.join(cohorts, "__e")
      .groupBy(col("__cohort"),
        (col("__p") - col("__cohort")).as("period_offset"))
      // (entity, period) is unique after the distinct, so count(*) IS
      // distinct entities — no second count-distinct expansion
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "__cohort")
      .select(col("__cohort").as("cohort_period"), col("period_offset"),
        col("n_active"), col("cohort_size"),
        round(col("n_active") / col("cohort_size"), 4).as("retention"))
  }

  /** First-order event transition matrix: for each ordered (from, to)
    * pair of consecutive event types within an entity's timeline, the
    * transition count and probability — the Markov-chain summary of
    * "what users do NEXT", the single-step structure [[funnel]]'s fixed
    * step list doesn't survey. Consecutive = `lead` over
    * (tsCol, tiebreak) per entity (ONE entity-keyed window — the sort
    * is per-entity, scale-safe); an entity's LAST event has no
    * successor and contributes no pair (no synthetic end state — the
    * row counts then sum to events − entities, which is the checkable
    * invariant). Probability is exact integer ppm,
    * floor(n·10⁶ / n_from), so the matrix hash-matches any engine.
    *
    * @return (from_type, to_type, n, p_ppm) — p_ppm normalized over
    *         each from_type's outgoing transitions
    */
  /** Conversion card over a [[funnel]] (or [[funnelAnyTouch]]-shaped)
    * relation: one row per step with how many entities reached it and
    * the step-over-step conversion in exact integer ppm — the summary
    * a dashboard shows above the per-entity relation. Step 1's
    * "previous" is itself (conversion 10⁶ when anyone enters), so the
    * column is never NULL on a populated funnel. One conditional-count
    * aggregate + a constant-size `stack` — cost is one pass over the
    * (already entity-sized) funnel relation.
    */
  def funnelSummary(funnel: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSummary needs the step list")
    val aggs = steps.indices.map(i =>
      count(when(col("steps_completed") >= i + 1, 1)).as(s"__n${i + 1}"))
    val row = funnel.agg(aggs.head, aggs.tail: _*)
    val stackArgs = steps.indices.map { i =>
      val prev = if (i == 0) "__n1" else s"__n$i"
      s"${i + 1}, '${steps(i).replace("'", "''")}', __n${i + 1}, $prev"
    }.mkString(", ")
    row.select(expr(s"stack(${steps.length}, $stackArgs) " +
        "AS (step, step_name, n_reached, __n_prev)"))
      .select(col("step").cast("int").as("step"), col("step_name"),
        col("n_reached"),
        when(col("__n_prev") > 0,
          expr("(n_reached * 1000000) div __n_prev"))
          .otherwise(lit(0)).cast("long").as("conv_from_prev_ppm"))
  }

  /** Session summary card over gap-based sessions: volume plus EXACT
    * median events-per-session and median session SPAN (last event −
    * first event; `session_window`'s end is last + gap, so the gap is
    * subtracted back out). Medians via
    * [[graft.ext.Prefix.groupPercentiles]] — distributed rank over the
    * session relation, no value-buffering aggregate — rounded 2dp in
    * the portable floor form so the card hash-matches any engine
    * replaying the interpolation.
    *
    * @param gap   the `session_window` gap expression (e.g.
    *              "30 minutes")
    * @param gapMs the same gap in ms (subtracted from window end)
    * @return one row: (n_sessions, n_entities, p50_events,
    *         p50_span_ms)
    */
  def sessionStats(events: DataFrame, entityCol: String, tsCol: Column,
                   gap: String, gapMs: Long): DataFrame = {
    // "__ev", not "__n": groupPercentiles binds its own "__n" internally
    val sessions = events
      .groupBy(session_window(tsCol, gap), col(entityCol).as("__e"))
      .agg(count(lit(1)).as("__ev"))
      .select(col("__e"), col("__ev"),
        (unix_millis(col("session_window.end")) - gapMs -
          unix_millis(col("session_window.start"))).as("__span"))
    def p50(value: Column, out: String) =
      graft.ext.Prefix.groupPercentiles(
        sessions.withColumn("__g", lit(1)), Seq("__g"), value,
        tiebreak = Seq(col("__e"), col("__span"), col("__ev")),
        ps = Seq(0.5 -> out)).select(col(out))
    def r2(c: Column) = floor(c * 100 + 0.5) / 100
    sessions.agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("__e")).as("n_entities"))
      .crossJoin(broadcast(p50(col("__ev").cast("double"), "p50_events")))
      .crossJoin(broadcast(p50(col("__span").cast("double"), "p50_span_ms")))
      .select(col("n_sessions"), col("n_entities"),
        r2(col("p50_events")).as("p50_events"),
        r2(col("p50_span_ms")).as("p50_span_ms"))
  }

  def transitionMatrix(events: DataFrame, entityCol: String,
                       typeCol: String, tsCol: Column,
                       tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(entityCol))
      .orderBy(tsCol +: tiebreak: _*)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__n_from"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000) div __n_from").cast("long").as("p_ppm"))
  }
}
