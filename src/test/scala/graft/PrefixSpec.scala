package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.Prefix

/** The distributed two-pass prefix scheme must be row-identical to the
  * single-partition window formulation it replaces — including for
  * FRACTIONAL value columns, whose subtotals a long cast silently
  * truncated before the round-3 advice fix.
  */
class PrefixSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("globalRowNumber equals the single-window row_number (fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map(i => (i.toLong, rnd.nextInt(50)))
    val df = rows.toDF("id", "k").repartition(16)
    val got = Prefix.globalRowNumber(df, Seq(col("k"), col("id")), "rn")
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("globalRunningSum carries fractional values exactly (fuzz)") {
    import spark.implicits._
    // quarter-integer values are binary-exact, so the two-pass result
    // must EQUAL the single-window running sum bit for bit — under the
    // old long-cast subtotals every partition boundary dropped the
    // accumulated fraction
    val rnd = new scala.util.Random(13)
    val rows = (0 until 4000).map(i => (i.toLong, rnd.nextInt(1000) / 4.0))
    val df = rows.toDF("id", "v").repartition(16)
    val got = Prefix.globalRunningSum(df, Seq(col("id")), col("v"), "rs")
      .select("id", "rs").as[(Long, Double)].collect().toMap
    val want = df.withColumn("rs", sum(col("v")).over(
        Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "rs").as[(Long, Double)].collect().toMap
    assert(got.size == want.size)
    val bad = got.collect { case (id, v) if v != want(id) => (id, v, want(id)) }
    assert(bad.isEmpty, s"fractional running sums diverge: ${bad.take(3)}")
    // and the result is genuinely fractional (the old truncation would
    // have zeroed every .25/.5/.75 tail)
    assert(got.values.exists(v => v != math.floor(v)))
  }

  test("globalRunningSum keeps integral columns in long (type + exactness)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, (i % 7).toLong))
      .toDF("id", "v").repartition(8)
    val out = Prefix.globalRunningSum(df, Seq(col("id")), col("v"), "rs")
    assert(out.schema("rs").dataType == org.apache.spark.sql.types.LongType,
      s"integral input must stay long, got ${out.schema("rs").dataType}")
    val got = out.select("id", "rs").as[(Long, Long)].collect().toMap
    var acc = 0L
    val want = (0 until 1000).map { i => acc += i % 7; i.toLong -> acc }.toMap
    assert(got == want)
  }

  test("stratifiedNtile equals the per-stratum ntile window (fuzz over k and skew)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // skewed strata (one huge, several tiny — including sizes < k so the
    // n<k branch exercises) plus duplicate order keys to hit ties, plus a
    // NULL stratum: window partitionBy buckets the NULL partition, so the
    // helper's join must be null-safe or those rows silently vanish
    val rows = (0 until 3000).map { i =>
      val stratum =
        if (rnd.nextInt(20) == 0) null
        else if (rnd.nextInt(10) < 6) "big"
        else s"s${rnd.nextInt(7)}"
      (i.toLong, stratum, rnd.nextInt(40))
    } ++ Seq((9001L, "lone", 1), (9002L, "pair", 1), (9003L, "pair", 2))
    val df = rows.toDF("id", "src", "v").repartition(16)
    for (k <- Seq(1, 2, 3, 4, 7)) {
      val got = Prefix.stratifiedNtile(df, Seq(col("src")),
          Seq(col("v"), col("id")), k, "b")
        .select("id", "b").as[(Long, Int)].collect().toMap
      val want = df.withColumn("b", ntile(k).over(
          Window.partitionBy(col("src")).orderBy(col("v"), col("id"))))
        .select("id", "b").as[(Long, Int)].collect().toMap
      assert(got == want, s"k=$k: ${got.toSet.diff(want.toSet).take(5)}")
    }
  }

  test("groupPercentiles equals the percentile aggregate bit-for-bit (fuzz)") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // skewed groups (one huge, tiny ones incl. n=1 so h=0 for every p),
    // duplicate values (rank ties), NULL values (aggregate skips them —
    // the helper must too), and a NULL group (percentile groups NULLs
    // together; the helper's stats join must be null-safe)
    val rows = (0 until 4000).map { i =>
      val g =
        if (rnd.nextInt(25) == 0) null
        else if (rnd.nextInt(10) < 6) "big"
        else s"g${rnd.nextInt(5)}"
      val v: java.lang.Double =
        if (rnd.nextInt(30) == 0) null
        else rnd.nextInt(50) + rnd.nextDouble()
      (i.toLong, g, v)
    } ++ Seq((9001L, "lone", java.lang.Double.valueOf(3.25)))
    val df = rows.toDF("id", "g", "v").repartition(16)
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    val got = Prefix.groupPercentiles(df, Seq("g"), col("v"),
        tiebreak = Seq(col("id")), ps = ps.map(p => p -> s"p$p"))
      .collect().map(r => Option(r.getString(0)) ->
        ps.indices.map(i => r.getDouble(i + 1)).toList).toMap
    val want = df.groupBy(col("g"))
      .agg(expr(s"percentile(v, 0.0)"), expr(s"percentile(v, 0.25)"),
        expr(s"percentile(v, 0.5)"), expr(s"percentile(v, 0.75)"),
        expr(s"percentile(v, 0.95)"), expr(s"percentile(v, 1.0)"))
      .collect().map(r => Option(r.getString(0)) ->
        ps.indices.map(i => r.getDouble(i + 1)).toList).toMap
    assert(got.keySet == want.keySet)
    for (k <- got.keySet)
      assert(got(k) == want(k), s"group $k: got ${got(k)} want ${want(k)}")
  }

  test("adjacentPairs equals the sorted-sequence zip (fuzz over partitionings)") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // duplicate keys force boundary ties; the unique id breaks them
    val rows = (0 until 3000).map(i => (i.toLong, rnd.nextInt(40)))
    val want = rows.sortBy(r => (r._2, r._1)).sliding(2).collect {
      case Seq((ida, ka), (idb, kb)) => (ida, ka, idb, kb)
    }.toSet
    for (np <- Seq(1, 7, 64)) {
      val df = rows.toDF("id", "k").repartition(np)
      val got = Prefix.adjacentPairs(df, Seq(col("k"), col("id")),
          Seq("id", "k"))
        .as[(Long, Int, Long, Int)].collect().toSet
      assert(got == want, s"np=$np")
    }
  }
}
