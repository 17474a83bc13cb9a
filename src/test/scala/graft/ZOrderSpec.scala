package graft
// (space-filling-curve clustering + min/max file skipping)

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.ZOrder
import graft.functions.Curves

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("hilbert2D: bijective, round-trips, and unit-step adjacent on the full order-7 grid") {
    val order = 7
    val n = 1 << order
    // exhaustive: every cell maps to a distinct d in [0, n^2), inverts,
    // and consecutive d are GRID NEIGHBORS — the locality property the
    // layout clustering rides on, and a check a wrong rotation in
    // either direction cannot pass
    val cells = Array.ofDim[(Long, Long)](n * n)
    for (x <- 0 until n; y <- 0 until n) {
      val d = Curves.hilbert2D(x, y, order)
      assert(d >= 0 && d < n.toLong * n, s"d out of range: ($x,$y) -> $d")
      assert(cells(d.toInt) == null, s"collision at d=$d: ($x,$y) vs ${cells(d.toInt)}")
      cells(d.toInt) = (x.toLong, y.toLong)
      assert(Curves.hilbertInverse(d, order) == ((x.toLong, y.toLong)),
        s"inverse mismatch at ($x,$y)")
    }
    for (d <- 0 until n * n - 1) {
      val (x1, y1) = cells(d); val (x2, y2) = cells(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jumps at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert2d expression (codegen path) == the plain-Scala kernel") {
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val rnd = new scala.util.Random(7L)
    val pts = Seq.fill(500)((rnd.nextLong().abs % 65536, rnd.nextLong().abs % 65536))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.VectorFunctions.hilbert2d(col("x"), col("y"), 16).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == Curves.hilbert2D(x, y, 16))
    }
  }

  test("zValue columns == bit-interleave reference; gridCell == offset-and-shift reference") {
    import spark.implicits._
    def spreadRef(v: Long): Long =
      (0 until 16).map(i => ((v >> i) & 1L) << (2 * i)).reduce(_ | _)
    def cellRef(v: Long, lo: Long, hi: Long): Long = {
      val cl = math.min(math.max(v - lo, 0L), math.max(hi - lo, 0L))
      val s = ZOrder.gridShift(lo, hi)
      if (s >= 0) cl >> s else cl << -s
    }
    val rnd = new scala.util.Random(13L)
    // dim a NARROW (2k values — must be up-shifted to fill the grid),
    // dim b wide (2^40 — down-shifted)
    val rows = Seq.fill(300)((rnd.nextLong().abs % 2000, rnd.nextLong().abs % (1L << 40)))
    val (loA, hiA) = (0L, 1999L)
    val (loB, hiB) = (0L, (1L << 40) - 1)
    assert(ZOrder.gridShift(loA, hiA) < 0, "narrow span must up-shift")
    assert(ZOrder.gridShift(loB, hiB) > 0, "wide span must down-shift")
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.zValue(col("a"), loA, hiA, col("b"), loB, hiB).as("zv"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (a, b) =>
      val ca = cellRef(a, loA, hiA); val cb = cellRef(b, loB, hiB)
      assert(ca < 65536 && cb < 65536, s"cell overflow: $ca $cb")
      val expect = spreadRef(ca) | (spreadRef(cb) << 1)
      assert(got((a, b)) == expect, s"zv mismatch at ($a,$b)")
    }
  }

  test("zorderWrite + prunedRead: box query equals full-scan filter and skips most files; linear layout cannot") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"))
    val root = Files.createTempDirectory("graft_zorder").toString
    val nFiles = 32
    // three layouts over identical rows: Z, Hilbert, and the
    // single-dim baseline (range-sorted by ts only — what a naive
    // time-partitioned table gives you)
    val zb = ZOrder.zorderWrite(ev, s"$root/z", "user_id", "ts_ms", nFiles)
    ZOrder.zorderWrite(ev, s"$root/h", "user_id", "ts_ms", nFiles, curve = "hilbert")
    ev.repartitionByRange(nFiles, col("ts_ms"))
      .sortWithinPartitions(col("ts_ms"))
      .write.parquet(s"$root/linear")
    def box(loFracA: Long, hiFracA: Long, loFracB: Long, hiFracB: Long) = {
      val (sa, sb) = (zb.hiA - zb.loA, zb.hiB - zb.loB)
      (zb.loA + sa * loFracA / 16, zb.loA + sa * hiFracA / 16,
        zb.loB + sb * loFracB / 16, zb.loB + sb * hiFracB / 16)
    }
    // two query shapes: a box selective in both dims, and the shape
    // single-dim layouts CANNOT prune — narrow in user_id, full time
    // range ("one user cohort's whole history")
    val both = box(7, 9, 7, 9)
    val stripe = box(7, 8, 0, 16)
    for ((ua, ub, ta, tb) <- Seq(both, stripe)) {
      val expect = ev.filter(col("user_id").between(ua, ub) &&
          col("ts_ms").between(ta, tb))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(expect.nonEmpty, "fixture box must hit rows")
      for (curve <- Seq("z", "h")) {
        val got = ZOrder.prunedRead(spark, s"$root/$curve", ua, ub, ta, tb)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == expect, s"$curve pruned read diverges from full scan")
        val (kept, total) = ZOrder.pruneFiles(spark, s"$root/$curve", ua, ub, ta, tb)
        assert(total == nFiles)
        assert(kept.size <= nFiles / 2,
          s"$curve: expected real skipping, kept ${kept.size}/$total")
      }
    }
    // the structural claim, on the stripe: the ts-sorted layout's every
    // file spans ~the full user range, so min/max skipping keeps ~all
    // of them; the curve layouts co-locate the stripe
    val (ua, ub, ta, tb) = stripe
    val linStats = spark.read.parquet(s"$root/linear")
      .groupBy(input_file_name()).agg(min("user_id"), max("user_id"),
        min("ts_ms"), max("ts_ms"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val linKept = linStats.count { case (la, ha, lb, hb) =>
      la <= ub && ha >= ua && lb <= tb && hb >= ta }
    val (zKept, _) = ZOrder.pruneFiles(spark, s"$root/z", ua, ub, ta, tb)
    val (hKept, _) = ZOrder.pruneFiles(spark, s"$root/h", ua, ub, ta, tb)
    info(s"files kept for the user-stripe box: z=${zKept.size}, " +
      s"hilbert=${hKept.size}, linear=$linKept of $nFiles")
    assert(linKept >= nFiles * 3 / 4,
      s"fixture: the single-dim layout should be unprunable here, kept $linKept")
    assert(zKept.size * 2 <= linKept && hKept.size * 2 <= linKept,
      s"curve layouts must beat single-dim clustering: z=${zKept.size} " +
        s"h=${hKept.size} linear=$linKept")
    // empty-box fast path: manifest proves emptiness, zero files read
    val none = ZOrder.prunedRead(spark, s"$root/z",
      zb.hiA + 10, zb.hiA + 20, ta, tb)
    assert(none.isEmpty)
  }

  test("operational loop: appends stay correct immediately, recluster restores selectivity") {
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    val root = Files.createTempDirectory("graft_zloop").toString + "/t"
    // initial layout: the first 60% of events; three appends of ~13% each
    val base = ev.filter(col("event_id") % 10 < 6)
    val zb = ZOrder.zorderWrite(base, root, "user_id", "ts_ms", 16)
    def stripe = {
      val sa = zb.hiA - zb.loA
      (zb.loA + sa * 7 / 16, zb.loA + sa * 8 / 16, zb.loB, zb.hiB)
    }
    val (ua, ub, ta, tb) = stripe
    def expectFor(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("user_id").between(ua, ub) && col("ts_ms").between(ta, tb))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def got() = ZOrder.prunedRead(spark, root, ua, ub, ta, tb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (kept0, total0) = ZOrder.pruneFiles(spark, root, ua, ub, ta, tb)
    assert(got() == expectFor(base))
    var appended = base
    for (m <- 6 to 8) {
      val batch = ev.filter(col("event_id") % 10 === m)
      val newBoxes = ZOrder.appendToLayout(batch, root, nFiles = 2)
      assert(newBoxes.size == 2)
      appended = appended.unionByName(batch)
      // correctness holds IMMEDIATELY after each append, before any
      // re-optimize — the new files' true boxes cover them
      assert(got() == expectFor(appended), s"append $m diverged")
    }
    val (keptApp, totalApp) = ZOrder.pruneFiles(spark, root, ua, ub, ta, tb)
    assert(totalApp == total0 + 6)
    // appended batches are curve-sorted only among themselves: each
    // append's files span wide user ranges, so the stripe now keeps
    // MORE files (the degradation recluster exists to fix)
    assert(keptApp.size > kept0.size,
      s"fixture: appends should degrade pruning (${kept0.size} -> ${keptApp.size})")
    // recluster: same rows, tight layout again
    ZOrder.recluster(spark, root, 16)
    assert(got() == expectFor(appended), "recluster changed query results")
    val (keptOpt, totalOpt) = ZOrder.pruneFiles(spark, root, ua, ub, ta, tb)
    assert(totalOpt == 16)
    assert(keptOpt.size < keptApp.size,
      s"recluster must restore selectivity (${keptApp.size} -> ${keptOpt.size})")
    info(s"files kept for the stripe: fresh ${kept0.size}/$total0, " +
      s"after 3 appends ${keptApp.size}/$totalApp, " +
      s"reclustered ${keptOpt.size}/$totalOpt")
    // empty batch: no files, no manifest growth
    assert(ZOrder.appendToLayout(ev.filter(lit(false)), root).isEmpty)
    assert(ZOrder.readManifest(spark, root).boxes.size == 16)
  }

  test("pruneFiles refuses a manifest that no longer matches the directory") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"))
    val dir = Files.createTempDirectory("graft_zstale").toString + "/t"
    val b = ZOrder.zorderWrite(ev, dir, "user_id", "ts_ms", 4)
    // simulate a concurrent compaction: delete one part file
    val victim = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .head
    assert(victim.delete())
    val e = intercept[IllegalArgumentException] {
      ZOrder.pruneFiles(spark, dir, b.loA, b.hiA, b.loB, b.hiB)
    }
    assert(e.getMessage.contains("mismatch"), e.getMessage)
  }
}
