package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.DataQuality

/** [[DataQuality.psi]] — drift semantics the oracle row can't isolate:
  * zero drift is exactly zero, total mass displacement hits the
  * closed-form PSI, edge values bucket left (strict >), empty buckets
  * take the epsilon clamp, and the guards reject bad dials.
  */
class DataQualitySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def run(ref: Seq[Double], cur: Seq[Double], nBuckets: Int = 10) =
    DataQuality.psi(ref.toDF("x"), cur.toDF("x"), col("x"), nBuckets)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("identical snapshots: every bucket's contribution is exactly 0") {
    val vals = (1 to 100).map(_.toDouble)
    val out = run(vals, vals)
    assert(out.keySet == (1 to 10).toSet)
    assert(out.values.forall { case (nr, nc, psi) =>
      nr == 10L && nc == 10L && psi == 0L })
  }

  test("total displacement: closed-form PSI with the epsilon clamp") {
    val ref = (1 to 100).map(_.toDouble)
    val cur = Seq.fill(50)(1000.0) // all mass beyond the last edge
    val out = run(ref, cur)
    val eps = 1e-6
    def micro(fc: Double, fr: Double): Long =
      math.floor((fc - fr) * math.log(fc / fr) * 1e6 + 0.5).toLong
    for (b <- 1 to 9)
      assert(out(b) == ((10L, 0L, micro(eps, 0.1))), s"bucket $b")
    assert(out(10) == ((10L, 50L, micro(1.0, 0.1))))
  }

  test("streaming drift monitor: frozen profile, per-tick PSI, batch == snapshot form") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ref = (1 to 100).map(_.toDouble)
    val profile = DataQuality.psiProfile(ref.toDF("x"), col("x"), 10)
    assert(profile.edges.length == 9 &&
      profile.refFrac.forall(_ == 0.1), "uniform reference deciles")
    // a batch drawn from the reference distribution drifts exactly 0
    assert(DataQuality.psiTick(profile, ref.toDF("x"), col("x")) == 0.0)
    // tick == the batch-form psi on the same snapshot pair (micro-units)
    val shifted = (51 to 150).map(_.toDouble)
    val tick = DataQuality.psiTick(profile, shifted.toDF("x"), col("x"))
    val batchForm = DataQuality.psi(ref.toDF("x"), shifted.toDF("x"),
        col("x"), 10)
      .agg(sum(col("psi_x1e6"))).collect()(0).getLong(0) / 1e6
    assert(math.abs(tick - batchForm) < 1e-5, s"$tick vs $batchForm")
    assert(tick > 0.25, "half the mass moved: major-shift territory")
    // empty batch: NaN, not a spurious zero-drift signal
    assert(DataQuality.psiTick(profile,
      Seq.empty[Double].toDF("x"), col("x")).isNaN)
    // the production wiring: one drift number per micro-batch from a
    // foreachBatch body, profile frozen at stream start
    val in = MemoryStream[Double]
    val ticks = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val q = in.toDS().toDF("x").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       id: Long) =>
        ticks.synchronized {
          ticks += id -> DataQuality.psiTick(profile, batch, col("x"))
        }; ()
      }.start()
    in.addData(ref: _*)
    q.processAllAvailable()
    in.addData(shifted: _*)
    q.processAllAvailable()
    q.stop()
    val byId = ticks.toMap
    assert(byId(0L) == 0.0 && math.abs(byId(1L) - batchForm) < 1e-5)
  }

  test("psiSeries: per-period PSI == per-slice tick; quiet and drifted periods side by side") {
    val ref = (1 to 100).map(_.toDouble)
    val profile = DataQuality.psiProfile(ref.toDF("x"), col("x"), 10)
    // period 1 matches the reference, period 2 is half-shifted, period
    // 3 has only NULL values (must be ABSENT, not zero-drift)
    val cur = ref.map(v => (1, Some(v))) ++
      (51 to 150).map(v => (2, Some(v.toDouble))) ++
      Seq((3, None: Option[Double]))
    val out = DataQuality.psiSeries(profile, cur.toDF("p", "x"),
        col("x"), col("p"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out.keySet == Set(1, 2), "null-only period must be absent")
    assert(out(1) == ((100L, 0L)), "reference-identical period: PSI 0")
    // the drifted period agrees with the tick on the same slice
    // (micro-floor per bucket: within nBuckets/2 micro of the raw sum)
    val tick = DataQuality.psiTick(profile,
      (51 to 150).map(_.toDouble).toDF("x"), col("x"))
    assert(math.abs(out(2)._2 / 1e6 - tick) < 1e-5,
      s"series ${out(2)._2 / 1e6} vs tick $tick")
    assert(out(2)._2 > 250000L, "half the mass moved: major shift")
  }

  test("catPsiSeries: per-period mix drift; unseen categories land in OTHER") {
    val ref = Seq.fill(60)("en") ++ Seq.fill(30)("de") ++ Seq.fill(10)("fr")
    val profile = DataQuality.catPsiProfile(ref.toDF("c"), col("c"), topK = 2)
    // period 1 = the reference mix; period 2 = all brand-new categories
    // (every row in OTHER — the biggest categorical shift there is)
    val cur = ref.map(c => (1, c)) ++ (1 to 100).map(i => (2, s"xx$i"))
    val out = DataQuality.catPsiSeries(profile, cur.toDF("p", "c"),
        col("c"), col("p"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out(1) == ((100L, 0L)), "reference-identical period: PSI 0")
    val tick = DataQuality.catPsiTick(profile,
      (1 to 100).map(i => s"xx$i").toDF("c"), col("c"))
    assert(math.abs(out(2)._2 / 1e6 - tick) < 1e-5,
      s"series ${out(2)._2 / 1e6} vs tick $tick")
    assert(out(2)._2 > 250000L, "all-new mix: major shift")
  }

  test("edge values bucket LEFT (strict >); guards reject bad dials") {
    // ref 1..4 with nBuckets=2: the single edge is the median 2.5;
    // cur values AT 2.5 belong to bucket 1
    val out = run(Seq(1, 2, 3, 4).map(_.toDouble),
      Seq(2.5, 2.5, 3.0), nBuckets = 2)
    assert(out(1)._2 == 2L && out(2)._2 == 1L)
    intercept[IllegalArgumentException] {
      DataQuality.psi(Seq(1.0).toDF("x"), Seq(1.0).toDF("x"), col("x"), 1)
    }
    intercept[IllegalArgumentException] {
      DataQuality.psi(Seq(1.0).toDF("x"), Seq(1.0).toDF("x"), col("x"),
        10, epsilon = 0.0)
    }
  }

  test("categorical drift monitor: frozen top-K profile, OTHER roll-up, tick == batch form, streaming wiring") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    // reference mix: en 50, de 30, fr 15, es 4, zh 1 — topK=3 freezes
    // {en, de, fr}; es+zh roll into __other__
    val ref = (Seq.fill(50)("en") ++ Seq.fill(30)("de") ++
      Seq.fill(15)("fr") ++ Seq.fill(4)("es") ++ Seq("zh"))
    val profile = DataQuality.catPsiProfile(ref.toDF("lang"),
      col("lang"), topK = 3)
    assert(profile.categories == Seq("en", "de", "fr"),
      s"top-K by count: ${profile.categories}")
    assert(profile.refFrac == Seq(0.5, 0.3, 0.15, 0.05),
      s"fractions incl. OTHER: ${profile.refFrac}")
    // a batch drawn from the reference mix drifts exactly 0
    assert(DataQuality.catPsiTick(profile, ref.toDF("lang"),
      col("lang")) == 0.0)
    // tick == batch form on the same snapshot pair (micro-units) —
    // including a category UNSEEN at profile time ("ja" → __other__)
    val shifted = (Seq.fill(20)("en") ++ Seq.fill(10)("de") ++
      Seq.fill(40)("ja") ++ Seq.fill(30)("zh"))
    val tick = DataQuality.catPsiTick(profile, shifted.toDF("lang"),
      col("lang"))
    val batchForm = DataQuality.catPsi(ref.toDF("lang"),
        shifted.toDF("lang"), col("lang"), topK = 3)
      .agg(sum(col("psi_x1e6"))).collect()(0).getLong(0) / 1e6
    assert(math.abs(tick - batchForm) < 1e-5, s"$tick vs $batchForm")
    assert(tick > 0.25, "70% of the mass left the frozen buckets: major shift")
    // empty batch: NaN, not a spurious zero-drift signal
    assert(DataQuality.catPsiTick(profile,
      Seq.empty[String].toDF("lang"), col("lang")).isNaN)
    // batch form mirrors the numeric guards: empty current -> NULL psi,
    // empty reference -> loud error
    assert(DataQuality.catPsi(ref.toDF("lang"),
        Seq.empty[String].toDF("lang"), col("lang"), topK = 3)
      .collect().forall(_.isNullAt(3)))
    intercept[IllegalArgumentException] {
      DataQuality.catPsi(Seq.empty[String].toDF("lang"),
        ref.toDF("lang"), col("lang"))
    }
    // deterministic tie-break: equal counts -> lexicographically
    // smaller category takes the slot
    val tied = DataQuality.catPsiProfile(
      Seq("b", "b", "a", "a", "c", "c").toDF("x"), col("x"), topK = 2)
    assert(tied.categories == Seq("a", "b"))
    // sentinel collision is a documented contract: a REAL category
    // named "__other__" conflates with the roll-up bucket (identically
    // in both engines — see CatOther's scaladoc), here visible as the
    // bucket holding its 2 rows plus the tail's 1
    val coll = DataQuality.catPsi(
      Seq("a", "a", "a", "__other__", "__other__", "z").toDF("x"),
      Seq("a", "a", "a", "__other__", "__other__", "z").toDF("x"),
      col("x"), topK = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(coll == Map("a" -> 3L, DataQuality.CatOther -> 3L))
    // production wiring: one categorical drift number per micro-batch
    val in = MemoryStream[String]
    val ticks = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val q = in.toDS().toDF("lang").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       id: Long) =>
        ticks.synchronized {
          ticks += id -> DataQuality.catPsiTick(profile, batch, col("lang"))
        }; ()
      }.start()
    in.addData(ref: _*)
    q.processAllAvailable()
    in.addData(shifted: _*)
    q.processAllAvailable()
    q.stop()
    val byId = ticks.toMap
    assert(byId(0L) == 0.0 && math.abs(byId(1L) - batchForm) < 1e-5)
  }

  test("embedding drift monitor: frozen per-label centroid/dispersion, shifted batch alerts, unshifted doesn't") {
    import graft.ext.Similarity
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    // label A lives at (1,0,0,0) ± 0.1 on axis 2 (dispersion exactly
    // 0.1); label B at (0,1,0,0) ± 0.2 (dispersion 0.2); label C is a
    // degenerate single point
    def vecs(center: Array[Float], jitterAxis: Int, jitter: Float,
             n: Int): Seq[Array[Float]] =
      (0 until n).map { i =>
        val v = center.clone()
        v(jitterAxis) = v(jitterAxis) + (if (i % 2 == 0) jitter else -jitter)
        v
      }
    val a = vecs(Array(1f, 0f, 0f, 0f), 1, 0.1f, 10).map(("A", _))
    val b = vecs(Array(0f, 1f, 0f, 0f), 2, 0.2f, 10).map(("B", _))
    val c = Seq(("C", Array(0f, 0f, 0f, 1f)))
    val ref = (a ++ b ++ c).toDF("label", "emb")
    val profile = Similarity.embeddingDriftProfile(ref, "emb", "label")
    assert(profile.dim == 4)
    assert(math.abs(profile.labels("A").dispersion - 0.1) < 1e-7)
    assert(math.abs(profile.labels("B").dispersion - 0.2) < 1e-7)
    assert(profile.labels("C").dispersion == 0.0)
    assert(profile.labels("A").centroid.zip(Seq(1.0, 0.0, 0.0, 0.0))
      .forall { case (x, y) => math.abs(x - y) < 1e-7 })
    // unshifted batch: the batch centroid coincides with the frozen one
    val same = Similarity.embeddingDriftTick(profile, ref, "emb", "label")
    assert(same("A")._2 < 1e-7 && same("B")._2 < 1e-7 && same("C")._2 == 0.0,
      s"same-distribution batch must not alert: $same")
    // label A's mean moved 0.5 along axis 0 = 5 dispersion units;
    // label B unshifted in the same batch stays quiet
    val shifted = (vecs(Array(1.5f, 0f, 0f, 0f), 1, 0.1f, 10).map(("A", _))
      ++ vecs(Array(0f, 1f, 0f, 0f), 2, 0.2f, 10).map(("B", _)))
      .toDF("label", "emb")
    val tick = Similarity.embeddingDriftTick(profile, shifted, "emb", "label")
    assert(math.abs(tick("A")._2 - 5.0) < 1e-6,
      s"0.5 shift over 0.1 dispersion = 5 units: ${tick("A")}")
    assert(tick("A")._1 == 10L)
    assert(tick("B")._2 < 1e-7, "co-batched unshifted label stays quiet")
    // degenerate reference label: any movement is +inf, none is 0
    val cShift = Seq(("C", Array(0f, 0f, 0.5f, 1f))).toDF("label", "emb")
    assert(Similarity.embeddingDriftTick(profile, cShift, "emb",
      "label")("C")._2.isPosInfinity)
    // a label unseen at freeze time: NaN (new-label alert, not a distance)
    val newLabel = Seq(("D", Array(1f, 1f, 1f, 1f))).toDF("label", "emb")
    assert(Similarity.embeddingDriftTick(profile, newLabel, "emb",
      "label")("D")._2.isNaN)
    // empty batch: empty map, no spurious signal
    assert(Similarity.embeddingDriftTick(profile,
      ref.limit(0), "emb", "label").isEmpty)
    // null labels excluded like null vectors (a null group would skip
    // the dispersion join and crash profile assembly — guarded)
    val withNull = ref.unionByName(
      Seq((null.asInstanceOf[String], Array(9f, 9f, 9f, 9f)))
        .toDF("label", "emb"))
    val pNull = Similarity.embeddingDriftProfile(withNull, "emb", "label")
    assert(pNull.labels.keySet == Set("A", "B", "C"))
    assert(Similarity.embeddingDriftTick(pNull, withNull, "emb", "label")
      .keySet == Set("A", "B", "C"))
    // empty reference: loud configuration error
    intercept[IllegalArgumentException] {
      Similarity.embeddingDriftProfile(ref.limit(0), "emb", "label")
    }
    // production wiring: per-micro-batch scores from foreachBatch,
    // profile frozen at stream start — same posture as psiTick
    val in = MemoryStream[(String, Array[Float])]
    val ticks = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Map[String, (Long, Double)])]
    val q = in.toDS().toDF("label", "emb").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       id: Long) =>
        ticks.synchronized {
          ticks += id -> Similarity.embeddingDriftTick(profile, batch,
            "emb", "label")
        }; ()
      }.start()
    in.addData(a ++ b: _*)
    q.processAllAvailable()
    in.addData(vecs(Array(1.5f, 0f, 0f, 0f), 1, 0.1f, 10).map(("A", _)): _*)
    q.processAllAvailable()
    q.stop()
    val byId = ticks.toMap
    assert(byId(0L)("A")._2 < 1e-7 && byId(0L)("B")._2 < 1e-7)
    assert(math.abs(byId(1L)("A")._2 - 5.0) < 1e-6)
  }

  test("empty snapshots: empty current -> NULL psi (no spurious all-clear); empty reference throws") {
    val ref = (1 to 100).map(_.toDouble)
    // empty current: every bucket's psi_x1e6 is NULL — the batch
    // analogue of psiTick's NaN. The unguarded arithmetic (0/0 -> NaN,
    // greatest(NaN, eps) = NaN, floor-cast 0) reported exactly-zero
    // drift for a snapshot that carries no signal at all.
    val out = DataQuality.psi(ref.toDF("x"),
        Seq.empty[Double].toDF("x"), col("x"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.isNullAt(3)))
    assert(out.length == 10)
    assert(out.forall { case (_, nCur, psiNull) => nCur == 0L && psiNull })
    // all-null current is the same empty distribution
    val outNull = DataQuality.psi(ref.toDF("x"),
        Seq[Option[Double]](None, None).toDF("x"), col("x"), 10)
      .collect()
    assert(outNull.forall(_.isNullAt(3)))
    // empty / all-null reference: loud, specific configuration error
    val eRef = intercept[IllegalArgumentException] {
      DataQuality.psi(Seq.empty[Double].toDF("x"), ref.toDF("x"),
        col("x"), 10)
    }
    assert(eRef.getMessage.contains("reference"))
    val eProf = intercept[IllegalArgumentException] {
      DataQuality.psiProfile(Seq[Option[Double]](None).toDF("x"), col("x"))
    }
    assert(eProf.getMessage.contains("reference"))
  }

  test("ksTest: brute-force parity, identical snapshots score 0, disjoint score max, ties jump together") {
    def brute(a: Seq[Double], b: Seq[Double]): Long = {
      // literal sup over pooled points of |C1*n2 - C2*n1|
      val pts = (a ++ b).distinct.sorted
      pts.map { x =>
        val c1 = a.count(_ <= x).toLong * b.length
        val c2 = b.count(_ <= x).toLong * a.length
        math.abs(c1 - c2)
      }.max
    }
    def run(a: Seq[Double], b: Seq[Double]) =
      DataQuality.ksTest(a.toDF("x"), b.toDF("x"), col("x"))
        .collect().head
    // identical -> 0
    val same = (1 to 50).map(_.toDouble)
    assert(run(same, same).getAs[Long]("ks_num") == 0L)
    // disjoint supports -> D = 1 (num = n1*n2, scaled = 1e6)
    val lo = (1 to 30).map(_.toDouble)
    val hi = (100 to 119).map(_.toDouble)
    val d = run(lo, hi)
    assert(d.getAs[Long]("ks_num") == 30L * 20L)
    assert(d.getAs[Long]("ks_x1e6") == 1000000L)
    // random-ish mixed fixtures == the literal brute force
    val a1 = Seq(1.0, 2.0, 2.0, 3.0, 7.0, 9.0)
    val b1 = Seq(2.0, 2.0, 4.0, 8.0)
    assert(run(a1, b1).getAs[Long]("ks_num") == brute(a1, b1))
    val a2 = (1 to 40).map(i => (i * 37 % 11).toDouble)
    val b2 = (1 to 25).map(i => (i * 53 % 13).toDouble)
    assert(run(a2, b2).getAs[Long]("ks_num") == brute(a2, b2))
    // empty current -> NULL statistic (no spurious all-clear)
    val e = run(same, Seq.empty)
    assert(e.getAs[Long]("n_cur") == 0L &&
      e.isNullAt(e.fieldIndex("ks_num")))
    // empty reference -> loud error
    intercept[IllegalArgumentException] {
      DataQuality.ksTest(Seq.empty[Double].toDF("x"),
        same.toDF("x"), col("x")).collect()
    }
  }

  test("profile: exact per-column card; approx mode agrees within the HLL bound") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")), (Some(2L), None),
      (None, Some("b"))).toDF("k", "s")
    val out = DataQuality.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("k").getAs[Long]("n_rows") == 4L)
    assert(out("k").getAs[Long]("n_null") == 1L)
    assert(out("k").getAs[Long]("null_ppm") == 250000L)
    assert(out("k").getAs[Long]("n_distinct") == 2L)
    assert(out("s").getAs[Long]("n_null") == 1L)
    assert(out("s").getAs[Long]("n_distinct") == 2L)
    // approx mode: regular aggregates (no Expand), estimates within
    // 3x the 5% default rsd of the exact counts on a larger fixture
    val big = spark.range(10000)
      .selectExpr("id % 997 AS k", "CAST(id % 37 AS STRING) AS s")
    val exact = DataQuality.profile(big, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    val est = DataQuality.profile(big, Seq("k", "s"), approx = true)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    for (c <- Seq("k", "s"))
      assert(math.abs(est(c) - exact(c)) <= math.max(1L,
        (0.15 * exact(c)).toLong), s"$c: ${est(c)} vs ${exact(c)}")
    val plan = DataQuality.profile(big, Seq("k", "s"), approx = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "approx mode must not Expand the scan")
    intercept[IllegalArgumentException] {
      DataQuality.profile(df, Seq.empty)
    }
  }

  test("ksBySlice: per-slice statistics match per-slice ksTest; one-sided slices report NULL") {
    val refDf = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 11.0),
      ("gone", 5.0)).toDF("s", "x") // slice absent from current
    val curDf = Seq(
      ("a", 3.0), ("a", 4.0), ("a", 5.0),
      ("b", 10.0), ("b", 11.0),
      ("new", 7.0)).toDF("s", "x")  // slice absent from reference
    val out = DataQuality.ksBySlice(refDf, curDf, col("x"), col("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    // each two-sided slice equals the single-pair ksTest on its slice
    for (sl <- Seq("a", "b")) {
      val single = DataQuality.ksTest(
        refDf.filter(col("s") === sl), curDf.filter(col("s") === sl),
        col("x")).collect().head
      assert(out(sl).getAs[Long]("ks_num") ==
        single.getAs[Long]("ks_num"), sl)
      assert(out(sl).getAs[Long]("ks_x1e6") ==
        single.getAs[Long]("ks_x1e6"), sl)
    }
    // identical slice -> 0; one-sided slices -> NULL alert, not zero
    assert(out("b").getAs[Long]("ks_num") == 0L)
    assert(out("gone").isNullAt(out("gone").fieldIndex("ks_num")))
    assert(out("gone").getAs[Long]("n_cur") == 0L)
    assert(out("new").isNullAt(out("new").fieldIndex("ks_num")))
    assert(out("new").getAs[Long]("n_ref") == 0L)
  }

  test("refIntegrity: orphans, null FKs, and duplicate child keys counted; clean relation reports zero") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    // fk=9 twice (orphan rows counted per ROW, not per key), fk=null
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L), None)
      .toDF("fk")
    val r = DataQuality.refIntegrity(child, col("fk"), parent, col("pk"),
      "child->parent").collect().head
    assert(r.getAs[String]("relation") == "child->parent")
    assert(r.getAs[Long]("n_child") == 6L)
    assert(r.getAs[Long]("n_null_fk") == 1L)
    assert(r.getAs[Long]("n_orphan") == 2L)
    assert(r.getAs[Long]("orphan_ppm") == 2L * 1000000L / 6L)
    // clean: every fk resolved, no nulls
    val clean = DataQuality.refIntegrity(
      Seq(1L, 2L).toDF("fk"), col("fk"), parent, col("pk"), "ok")
      .collect().head
    assert(clean.getAs[Long]("n_orphan") == 0L &&
      clean.getAs[Long]("n_null_fk") == 0L &&
      clean.getAs[Long]("orphan_ppm") == 0L)
    // duplicate PARENT keys must not multiply child rows (distinct pks)
    val dupParent = Seq(1L, 1L, 2L).toDF("pk")
    val d = DataQuality.refIntegrity(
      Seq(1L, 2L).toDF("fk"), col("fk"), dupParent, col("pk"), "dup")
      .collect().head
    assert(d.getAs[Long]("n_child") == 2L && d.getAs[Long]("n_orphan") == 0L)
  }

  test("madOutliers: hand-computed median/MAD, fence binds, nulls excluded") {
    // group a: values 1..9 + one wild point. med of (1..9, 100) =
    // (5+6)/2 = 5.5; devs = (4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,94.5)
    // sorted -> med of devs = (2.5+2.5)/2 = 2.5; fence 3*2.5 = 7.5 ->
    // only 94.5 is out.
    val df = ((1 to 9).map(v => ("a", Some(v.toDouble))) ++
      Seq(("a", Some(100.0)), ("a", None),
        ("b", Some(10.0)), ("b", Some(10.0)), ("b", Some(10.0))))
      .toDF("g", "v")
      .withColumn("id", monotonically_increasing_id())
    val out = DataQuality.madOutliers(df, Seq("g"), col("v"),
      tiebreak = Seq(col("id")), k = 3.0)
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n") == 10L) // the NULL row is excluded
    assert(a.getAs[Double]("med") == 5.5)
    assert(a.getAs[Double]("mad") == 2.5)
    assert(a.getAs[Long]("n_outliers") == 1L)
    // constant group: MAD = 0, nothing strictly exceeds 0 -> no outliers
    val b = out("b")
    assert(b.getAs[Double]("mad") == 0.0 &&
      b.getAs[Long]("n_outliers") == 0L)
  }

  test("cusum: closed form == the sequential recursion; planted shift alarms, quiet series doesn't") {
    // quiet around mu=10, then a sustained +5 shift
    val xs = Seq(10L, 11L, 9L, 10L, 10L, 15L, 15L, 15L, 15L, 10L)
    val series = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("t", "x")
    val out = DataQuality.cusum(series, col("t"), col("x"),
        mu = 10L, kappa = 1L, h = 8L)
      .orderBy("t").collect()
    // reference: the literal recursion
    var sp = 0L; var sn = 0L
    xs.zipWithIndex.foreach { case (x, i) =>
      sp = math.max(0L, sp + (x - 10L - 1L))
      sn = math.max(0L, sn + (10L - x - 1L))
      val r = out(i)
      assert(r.getAs[Long]("cusum_pos") == sp, s"pos at $i")
      assert(r.getAs[Long]("cusum_neg") == sn, s"neg at $i")
      assert(r.getAs[Boolean]("alarm_up") == (sp > 8L), s"alarm at $i")
    }
    // the shift fires the upward alarm; nothing before it does
    assert(out.take(5).forall(!_.getAs[Boolean]("alarm_up")))
    assert(out.drop(7).take(2).exists(_.getAs[Boolean]("alarm_up")))
    assert(out.forall(!_.getAs[Boolean]("alarm_down")))
    // dial guards
    intercept[IllegalArgumentException] {
      DataQuality.cusum(series, col("t"), col("x"), 10L, -1L, 8L)
    }
    intercept[IllegalArgumentException] {
      DataQuality.cusumCounts(series, col("t"), 0L, 10L, 1L, 8L)
    }
  }

  test("cusumTick: tick fold == batch closed form; one alarm per micro-batch from foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val xs = Seq(10L, 11L, 9L, 15L, 15L, 15L, 10L, 2L, 2L, 2L)
    // fold the tick over the series
    var st = DataQuality.CusumState(0L, 0L)
    val folded = xs.map { x =>
      val (s, up, down) = DataQuality.cusumTick(st, x, 10L, 1L, 8L)
      st = s
      (s.sp, s.sn, up, down)
    }
    // == the batch closed form, column for column
    val series = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("t", "x")
    val batch = DataQuality.cusum(series, col("t"), col("x"), 10L, 1L, 8L)
      .orderBy("t").collect()
      .map(r => (r.getAs[Long]("cusum_pos"), r.getAs[Long]("cusum_neg"),
        r.getAs[Boolean]("alarm_up"), r.getAs[Boolean]("alarm_down")))
    assert(folded == batch.toSeq)
    // the downward ramp at the end fires the downward alarm
    assert(folded.last._4 && !folded.last._3)
    // production wiring: one period per micro-batch, metric = count
    val in = MemoryStream[Long]
    var wst = DataQuality.CusumState(0L, 0L)
    val alarms = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    val q = in.toDS().toDF("v").writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       id: Long) =>
        val (s, up, _) = DataQuality.cusumTick(wst, b.count(), 3L, 0L, 7L)
        alarms.synchronized { wst = s; alarms += up }; ()
      }.start()
    in.addData(1L, 2L, 3L); q.processAllAvailable()   // x=3, sp=0
    in.addData(1L to 9L: _*); q.processAllAvailable() // x=9, sp=6 <= 7
    in.addData(1L to 9L: _*); q.processAllAvailable() // x=9, sp=12 > 7
    q.stop()
    assert(alarms.toSeq == Seq(false, false, true))
    assert(wst == DataQuality.CusumState(12L, 0L))
  }

  test("cusumCounts: per-period counts feed the detector; epoch-div period arithmetic") {
    // 3 events in period 0, 1 in period 1, 4 in period 2 (periodMs=100)
    val ev = Seq(10L, 20L, 99L, 150L, 200L, 210L, 220L, 290L).toDF("ts")
    val out = DataQuality.cusumCounts(ev, col("ts"), periodMs = 100L,
        mu = 2L, kappa = 0L, h = 100L)
      .orderBy("period").collect()
    assert(out.map(r => (r.getAs[Long]("period"), r.getAs[Long]("n")))
      .toSeq == Seq((0L, 3L), (1L, 1L), (2L, 4L)))
    // recursion over counts: d = n-2 -> sp: 1, 0, 2
    assert(out.map(_.getAs[Long]("cusum_pos")).toSeq == Seq(1L, 0L, 2L))
  }
}
