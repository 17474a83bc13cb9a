package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("asOf picks the latest right row at-or-before each left time") {
    val left = Seq((1L, "u", 100L), (2L, "u", 205L), (3L, "u", 50L))
      .toDF("lid", "k", "t")
    val right = Seq(("u", 100L, "r@100"), ("u", 200L, "r@200"), ("u", 300L, "r@300"))
      .toDF("k", "t", "tag")
    val out = Temporal.asOf(left, right, Seq("k"), "t", "t", Seq("tag"))
      .select("lid", "r_tag").as[(Long, String)].collect().toMap
    // lid=3 (t=50) has no preceding right row -> dropped (inner semantics)
    assert(out == Map(1L -> "r@100", 2L -> "r@200"))
  }

  test("asOf at equal timestamps sees the right row (at-or-before, not strictly-before)") {
    val left = Seq((1L, "k1", 10L)).toDF("lid", "k", "t")
    val right = Seq(("k1", 10L, "same-instant")).toDF("k", "t", "tag")
    val out = Temporal.asOf(left, right, Seq("k"), "t", "t", Seq("tag"))
      .select("r_tag").as[String].collect()
    assert(out.toSeq == Seq("same-instant"))
  }

  test("asOf matches keys independently and carries multiple columns") {
    val left = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("lid", "k", "t")
    val right = Seq(("a", 5L, "ra", 1.5), ("b", 6L, "rb", 2.5))
      .toDF("k", "t", "tag", "v")
    val out = Temporal.asOf(left, right, Seq("k"), "t", "t", Seq("tag", "v"))
      .select("lid", "r_tag", "r_v").as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "ra", 1.5), (2L, "rb", 2.5)))
  }

  test("asOf plan shuffles once on the key (no range-join pair blowup)") {
    val left = Seq((1L, "u", 100L)).toDF("lid", "k", "t")
    val right = Seq(("u", 50L, "r")).toDF("k", "t", "tag")
    val plan = Temporal.asOf(left, right, Seq("k"), "t", "t", Seq("tag"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected a single key shuffle, plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("asOf equals the naive range-join argmax on random data (differential)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val keys = Seq("k1", "k2", "k3")
      val left = (1 to 60).map(i =>
        (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(500).toLong))
        .toDF("lid", "k", "t")
      // right times unique per key (the asOf tie contract)
      val right = keys.flatMap { k =>
        rnd.shuffle((0 until 500).toList).take(25)
          .map(t => (k, t.toLong, s"$k@$t"))
      }.toDF("k", "t", "tag")
      val fast = Temporal.asOf(left, right, Seq("k"), "t", "t", Seq("tag"))
        .select("lid", "r_tag").as[(Long, String)].collect().toMap
      // naive model: range join + max-time pick
      val naive = left.as("l")
        .join(right.as("r"), col("l.k") === col("r.k") && col("r.t") <= col("l.t"))
        .groupBy(col("l.lid").as("lid"))
        .agg(max(struct(col("r.t"), col("r.tag"))).as("m"))
        .select(col("lid"), col("m.tag").as("tag"))
        .as[(Long, String)].collect().toMap
      assert(fast == naive, "asOf diverged from the naive argmax model")
    }
  }

  test("scd2 builds contiguous validity intervals with a flagged current row") {
    val ev = Seq(("u1", 1L, 100L, "s1"), ("u1", 2L, 200L, "s2"),
      ("u2", 3L, 150L, "t1")).toDF("k", "eid", "tms", "state")
    val out = Temporal.scd2(ev, Seq("k"), col("tms"), col("eid"))
      .select("k", "eid", "valid_from_ms", "valid_to_ms", "is_current")
      .as[(String, Long, Long, Long, Int)].collect().toSet
    assert(out == Set(
      ("u1", 1L, 100L, 200L, 0),
      ("u1", 2L, 200L, 253402300799999L, 1),
      ("u2", 3L, 150L, 253402300799999L, 1)))
  }

  test("scd2 orders equal-time events by the tiebreaker") {
    val ev = Seq(("k", 2L, 100L), ("k", 1L, 100L)).toDF("k", "eid", "tms")
    val out = Temporal.scd2(ev, Seq("k"), col("tms"), col("eid"))
      .select("eid", "is_current").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 1))
  }

  test("funnel: greedy order, strict after, window stall, first-touch anchor, repeated steps") {
    import spark.implicits._
    // u1 completes in order; u2 has the 'b' BEFORE its 'a' (order
    // violated -> stalls at step 1); u3's 'b' is outside the window;
    // u4 has TWO 'a's — first-touch anchors at t=0 so the window
    // excludes its late 'b' even though anchoring at the second 'a'
    // would admit it (documented first-touch semantics); u5 tests a
    // repeated step type needing two distinct 'a' events, strictly
    // increasing (its single 'a' must NOT satisfy both steps)
    val ev = Seq(
      (1L, "a", 10L), (1L, "b", 20L),
      (2L, "b", 5L), (2L, "a", 10L),
      (3L, "a", 0L), (3L, "b", 500L),
      (4L, "a", 0L), (4L, "a", 400L), (4L, "b", 450L),
      (5L, "a", 10L)).toDF("u", "et", "tms")
    def run(steps: Seq[String], w: Option[Long]) =
      Temporal.funnel(ev, "u", "et", col("tms"), steps, w)
        .collect().map(r => r.getLong(0) ->
          ((1 to steps.length).map(i =>
            if (r.isNullAt(i)) None else Some(r.getLong(i))),
            r.getInt(steps.length + 1))).toMap
    val f = run(Seq("a", "b"), Some(100L))
    assert(f(1L) == ((Seq(Some(10L), Some(20L)), 2)))
    assert(f(2L) == ((Seq(Some(10L), None), 1)), "b before a never counts")
    assert(f(3L) == ((Seq(Some(0L), None), 1)), "outside window")
    assert(f(4L) == ((Seq(Some(0L), None), 1)),
      "first-touch anchor: the 2nd 'a' would admit b@450, but the funnel anchors at 0")
    // unwindowed: u3 completes (greedy is anchor-independent without a window)
    assert(run(Seq("a", "b"), None)(3L) == ((Seq(Some(0L), Some(500L)), 2)))
    // repeated step type: u5's one 'a' cannot be both steps; u4's two can
    val rep = run(Seq("a", "a"), None)
    assert(rep(5L) == ((Seq(Some(10L), None), 1)))
    assert(rep(4L) == ((Seq(Some(0L), Some(400L)), 2)))
  }

  test("funnelAnyTouch: any qualifying chain, latest-feasible anchor, strict time, earliest completion") {
    import spark.implicits._
    val ev = Seq(
      (1L, "a", 10L), (1L, "b", 20L), // plain completion
      (2L, "b", 5L), (2L, "a", 10L), // order violated: no chain
      (3L, "a", 0L), (3L, "b", 500L), // outside window from ANY anchor
      // THE divergent case the first-touch spec pins as incomplete:
      // anchoring at the second 'a' admits b@450 — any-touch finds it
      (4L, "a", 0L), (4L, "a", 400L), (4L, "b", 450L),
      (5L, "a", 10L), // stalls at step 1
      (6L, "a", 10L), (6L, "b", 10L), // equal time: strictly-after fails
      (7L, "a", 10L), (7L, "b", 30L), (7L, "b", 90L) // two completions
    ).toDF("u", "et", "tms")
    def run(steps: Seq[String], w: Option[Long]) =
      Temporal.funnelAnyTouch(ev, "u", "et", col("tms"), steps, w)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
    val f = run(Seq("a", "b"), Some(100L))
    assert(f(1L) == ((10L, 20L)))
    assert(!f.contains(2L) && !f.contains(3L) && !f.contains(5L),
      s"no qualifying chain may be invented: $f")
    assert(!f.contains(6L), "equal timestamps cannot chain (strict >)")
    assert(f(4L) == ((400L, 450L)),
      "the existence answer first-touch anchoring misses")
    assert(f(7L) == ((10L, 30L)), "earliest qualifying completion wins")
    // latest-FEASIBLE anchor, not latest step-1: a@80 is later but only
    // becomes feasible once a 'v' follows it — the DP threads
    // a@80 → v@90 → c@120 (span 40); anchoring at a@0 would not fit
    val ev3 = Seq((9L, "a", 0L), (9L, "v", 10L), (9L, "a", 80L),
      (9L, "v", 90L), (9L, "c", 120L)).toDF("u", "et", "tms")
    val g = Temporal.funnelAnyTouch(ev3, "u", "et", col("tms"),
      Seq("a", "v", "c"), Some(100L)).collect()
    assert(g.length == 1 && g(0).getLong(1) == 80L &&
      g(0).getLong(2) == 120L, s"got ${g.toSeq}")
    // remove the late 'v': the late anchor loses feasibility and no
    // chain fits the window at all
    val ev4 = Seq((9L, "a", 0L), (9L, "v", 10L), (9L, "a", 80L),
      (9L, "c", 120L)).toDF("u", "et", "tms")
    assert(Temporal.funnelAnyTouch(ev4, "u", "et", col("tms"),
      Seq("a", "v", "c"), Some(100L)).isEmpty)
    // unwindowed: existence agrees with the first-touch funnel (greedy
    // is anchor-independent without a window)
    assert(run(Seq("a", "b"), None)(3L) == ((0L, 500L)))
  }

  test("funnelAnyTouch fuzz: DP == brute-force chain enumeration on random event sets") {
    import spark.implicits._
    // Reference semantics, enumerated directly: per entity, a chain is
    // a strictly-time-increasing event sequence matching the step
    // types; L(e) = max anchor over chains ending at e; e qualifies
    // iff t_e − L(e) ≤ W; report (max anchor at the earliest
    // qualifying completion time, that time).
    def brute(evs: Seq[(Long, String, Long)], steps: Seq[String],
              w: Option[Long]): Map[Long, (Long, Long)] =
      evs.groupBy(_._1).flatMap { case (ent, rows) =>
        val tv = rows.map(r => (r._2, r._3))
        def chains(k: Int): Seq[(Long, Long)] = // (t_k, best anchor)
          if (k == 1) tv.filter(_._1 == steps.head).map(r => (r._2, r._2))
          else {
            val prev = chains(k - 1)
            tv.filter(_._1 == steps(k - 1)).flatMap { r =>
              val anchors = prev.filter(_._1 < r._2).map(_._2)
              if (anchors.isEmpty) Nil else Seq((r._2, anchors.max))
            }
          }
        val qual = chains(steps.length)
          .filter { case (t, a) => w.forall(t - a <= _) }
        if (qual.isEmpty) None
        else {
          val tStar = qual.map(_._1).min
          Some(ent -> ((qual.filter(_._1 == tStar).map(_._2).max, tStar)))
        }
      }
    val rnd = new scala.util.Random(20260814L)
    val types = Seq("a", "b", "c")
    for (trial <- 1 to 25) {
      // small time range on purpose: equal timestamps (strict-> edges)
      // and dense interleavings are the hazardous shapes
      val evs = for {
        ent <- 0L until 5L
        _ <- 0 until (3 + rnd.nextInt(8))
      } yield (ent, types(rnd.nextInt(3)), rnd.nextInt(15).toLong)
      val steps = if (trial % 3 == 0) Seq("a", "b") else Seq("a", "b", "c")
      val w = if (trial % 4 == 0) None else Some(2L + rnd.nextInt(8))
      val got = Temporal.funnelAnyTouch(evs.toDF("u", "et", "tms"),
          "u", "et", col("tms"), steps, w)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val want = brute(evs, steps, w)
      assert(got == want,
        s"trial $trial (steps=$steps w=$w): DP $got != brute $want\nevents: $evs")
    }
  }

  test("retentionMatrix: diagonal is 1.0, cells match a brute-force cohort count, inactive periods absent") {
    import spark.implicits._
    val rnd = new scala.util.Random(11L)
    val period = 10L
    val evs = for {
      u <- 0L until 20L
      _ <- 0 until (1 + rnd.nextInt(8))
    } yield (u, rnd.nextInt(50).toLong)
    val got = Temporal.retentionMatrix(evs.toDF("u", "tms"), "u",
        col("tms"), period)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // brute force
    val byUser = evs.groupBy(_._1).view.mapValues(_.map(_._2 / period).toSet)
    val cohort = byUser.mapValues(_.min).toMap
    val sizes = cohort.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val want = byUser.toSeq.flatMap { case (u, ps) =>
      ps.map(p => (cohort(u), p - cohort(u)))
    }.groupBy(identity).map { case ((c, off), hits) =>
      val n = hits.size.toLong
      (c, off) -> ((n, sizes(c),
        BigDecimal(n.toDouble / sizes(c))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(got == want, s"got $got\nwant $want")
    // every cohort's offset-0 cell exists and retains everyone
    sizes.keys.foreach { c =>
      assert(got((c, 0L)) == ((sizes(c), sizes(c), 1.0)), s"diagonal of $c")
    }
  }

  test("groupKFold: groups are atomic, fold group-counts differ by at most one") {
    import spark.implicits._
    import graft.ext.Splits
    val df = (0L until 500L).map(i => (i, i % 37)).toDF("id", "grp")
    val folded = Splits.groupKFold(df, "grp", k = 5)
      .select(col("grp"), col("fold"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val perGroup = folded.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    perGroup.foreach { case (g, fs) =>
      assert(fs.size == 1, s"group $g straddles folds $fs")
    }
    val groupsPerFold = perGroup.toSeq.map(_._2.head)
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(groupsPerFold.keySet == (1 to 5).toSet)
    assert(groupsPerFold.values.max - groupsPerFold.values.min <= 1,
      s"unbalanced folds: $groupsPerFold")
  }

  test("funnelSummary: reach counts, step-over-step ppm, empty funnel zeros") {
    val f = Seq(
      (1L, 4), (2L, 4), (3L, 2), (4L, 1), (5L, 0))
      .toDF("entity", "steps_completed")
    val out = graft.operators.Temporal.funnelSummary(
      f, Seq("a", "b", "c", "d"))
      .collect().map(r => r.getInt(0) ->
        ((r.getString(1), r.getAs[Long]("n_reached"),
          r.getAs[Long]("conv_from_prev_ppm")))).toMap
    // reached: >=1: 4, >=2: 3, >=3: 2, >=4: 2
    assert(out(1) == (("a", 4L, 1000000L)))
    assert(out(2) == (("b", 3L, 750000L)))
    assert(out(3) == (("c", 2L, 666666L)))
    assert(out(4) == (("d", 2L, 1000000L)))
    // nobody enters: all counts and conversions are 0, no division blowup
    val empty = graft.operators.Temporal.funnelSummary(
      Seq((1L, 0)).toDF("entity", "steps_completed"), Seq("a", "b"))
      .collect()
    assert(empty.forall(r => r.getAs[Long]("n_reached") == 0L &&
      r.getAs[Long]("conv_from_prev_ppm") == 0L))
  }

  test("sessionStats: hand-computed card over planted sessions") {
    // u1: 3 sessions (3 events spanning 10 min, 1 event, 2 events
    // spanning 5 min); u2: 1 session of 1 event. gap 30 min.
    val min = 60000L
    val ev = Seq(
      (1L, 0L), (1L, 5 * min), (1L, 10 * min),
      (1L, 120 * min),
      (1L, 240 * min), (1L, 245 * min),
      (2L, 0L))
      .toDF("u", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val r = graft.operators.Temporal.sessionStats(
      ev, "u", col("ts"), gap = "30 minutes", gapMs = 1800000L)
      .collect().head
    assert(r.getAs[Long]("n_sessions") == 4L)
    assert(r.getAs[Long]("n_entities") == 2L)
    // events per session sorted: 1,1,2,3 -> p50 = 1.5
    assert(r.getAs[Double]("p50_events") == 1.5)
    // spans sorted: 0, 0, 5min, 10min -> p50 = 2.5 min
    assert(r.getAs[Double]("p50_span_ms") == 2.5 * min)
  }

  test("transitionMatrix: hand-computed pairs, terminal events dropped, ppm normalization, tiebreak order") {
    // u1: a -> b -> a ; u2: a -> b ; u3: b (terminal only, no pair)
    // pairs: (a,b) x2, (b,a) x1. from a: 2 total; from b: 1 total.
    val ev = Seq(
      (1L, "a", 10L, 100L), (1L, "b", 20L, 101L), (1L, "a", 30L, 102L),
      (2L, "a", 10L, 103L), (2L, "b", 20L, 104L),
      (3L, "b", 10L, 105L))
      .toDF("u", "ty", "ts", "eid")
    val m = graft.operators.Temporal.transitionMatrix(
      ev, "u", "ty", col("ts"), tiebreak = Seq(col("eid")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("p_ppm")))).toMap
    assert(m(("a", "b")) == ((2L, 1000000L)))
    assert(m(("b", "a")) == ((1L, 1000000L)))
    assert(m.size == 2, s"terminal events must not produce pairs: $m")
    // invariant: pair rows sum to events - entities
    assert(m.values.map(_._1).sum == 6L - 3L)
    // equal timestamps: the tiebreak column decides the successor
    val tied = Seq(
      (1L, "x", 10L, 1L), (1L, "y", 10L, 2L), (1L, "z", 10L, 3L))
      .toDF("u", "ty", "ts", "eid")
    val mt = graft.operators.Temporal.transitionMatrix(
      tied, "u", "ty", col("ts"), tiebreak = Seq(col("eid")))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(mt == Set(("x", "y"), ("y", "z")))
    // branching entity: ppm splits exactly with integer floor
    val br = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L),
      (2L, "a", 1L, 3L), (2L, "b", 2L, 4L),
      (3L, "a", 1L, 5L), (3L, "c", 2L, 6L))
      .toDF("u", "ty", "ts", "eid")
    val mb = graft.operators.Temporal.transitionMatrix(
      br, "u", "ty", col("ts"), tiebreak = Seq(col("eid")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("p_ppm")).toMap
    assert(mb(("a", "b")) == 666666L) // floor(2e6/3)
    assert(mb(("a", "c")) == 333333L) // floor(1e6/3)
  }
}
