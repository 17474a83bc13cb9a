package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ext.{IncrementalDedup, IngestLadder}

/** Per-registered-domain admission quota: the standalone steady-state
  * tick ([[IncrementalDedup.admitBatchDomainQuota]]) and its composed
  * form as the ingest ladder's final rung. First arrivals win, only
  * ADMITTED docs consume quota, NULL addresses pass uncounted, and the
  * stored counts survive maintenance folds.
  */
class DomainQuotaSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  test("standalone quota ticks: in-batch rank overflow, cross-tick " +
      "stored counts, NULL urls pass uncounted, replay idempotent") {
    import spark.implicits._
    val root = tmp("dq1")
    val tick1 = Seq(
      (1L, "http://a.com/p1"), (2L, "http://sub.a.com/p2"),
      (3L, "http://a.com/p3"),
      (4L, null.asInstanceOf[String]),
      (5L, "http://b.org/x")).toDF("doc_id", "url")
    val v1 = IncrementalDedup.admitBatchDomainQuota(tick1, "doc_id",
        "url", root, k = 2, batchId = 0L)
      .as[(Long, Option[String])].collect().toMap
    // a.com holds ids 1,2,3 (sub.a.com rolls up to a.com): rank 3
    // overflows k=2; the NULL url passes uncounted; b.org is under quota
    assert(v1 == Map(1L -> None, 2L -> None, 3L -> Some("domain"),
      4L -> None, 5L -> None), s"tick1 $v1")
    val counts = spark.read.parquet(s"$root/domain_counts")
      .select("reg_domain", "n").as[(String, Long)].collect().toMap
    assert(counts == Map("a.com" -> 2L, "b.org" -> 1L), s"counts $counts")
    val tick2 = Seq(
      (11L, "http://a.com/p11"), (12L, "http://www.a.com/p12"),
      (13L, "http://b.org/y"),
      (14L, null.asInstanceOf[String])).toDF("doc_id", "url")
    val v2 = IncrementalDedup.admitBatchDomainQuota(tick2, "doc_id",
        "url", root, k = 2, batchId = 1L)
      .as[(Long, Option[String])].collect().toMap
    // a.com stored count 2: both new docs overflow; b.org reaches
    // exactly k and keeps; NULL passes
    assert(v2 == Map(11L -> Some("domain"), 12L -> Some("domain"),
      13L -> None, 14L -> None), s"tick2 $v2")
    // replay under the same batch id: verdicts identical, counts and
    // corpus overwritten in place (no double-charged quota)
    val r2 = IncrementalDedup.admitBatchDomainQuota(tick2, "doc_id",
        "url", root, k = 2, batchId = 1L)
      .as[(Long, Option[String])].collect().toMap
    assert(r2 == v2, s"replay $r2 != $v2")
    val total = spark.read.parquet(s"$root/domain_counts")
      .groupBy("reg_domain").agg(sum("n").as("n"))
      .as[(String, Long)].collect().toMap
    assert(total == Map("a.com" -> 2L, "b.org" -> 2L), s"totals $total")
    val corpus = spark.read.parquet(s"$root/corpus")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(corpus == Seq(1L, 2L, 4L, 5L, 13L, 14L), s"corpus $corpus")
  }

  test("ingest ladder's domain rung: only docs that pass every content " +
      "rung consume quota; the rung runs last; counts fold through " +
      "maintainLadder") {
    import spark.implicits._
    val root = tmp("dq2")
    val tick1 = Seq(
      (1L, "unique page about alpine lichens and their habitats",
        "http://a.com/p1"),
      // exact copy of doc 1's text on a different page: drops at exact
      // and must NOT consume a.com's quota
      (2L, "unique page about alpine lichens and their habitats",
        "http://a.com/p2"),
      (3L, "a second distinct a.com page on glacier moraines here",
        "http://a.com/p3"),
      (4L, "a third distinct a.com page about fog harvesting nets",
        "http://a.com/p4")).toDF("doc_id", "text", "url")
    val v1 = IngestLadder.admitBatch(tick1, "doc_id", "text",
        Some("url"), gates = Seq.empty, root = root, n = 3, tau = 0.9,
        batchId = 0L, domainQuota = Some(2))
      .as[(Long, Option[String])].collect().toMap
    // survivors of the content rungs on a.com: 1, 3, 4 → ranks 1,2,3;
    // rank 3 (doc 4) overflows k=2. Doc 2's exact drop is quota-free.
    assert(v1 == Map(1L -> None, 2L -> Some("exact"),
      3L -> None, 4L -> Some("domain")), s"tick1 $v1")
    val counts = spark.read.parquet(s"$root/domain_counts")
      .select("reg_domain", "n").as[(String, Long)].collect().toMap
    assert(counts == Map("a.com" -> 2L), s"counts $counts")
    // maintenance folds domain_counts with the other subtrees
    val folded = IncrementalDedup.maintainLadder(spark, root,
      committedBelow = 1L)
    assert(folded("domain_counts") >= 1, s"fold $folded")
    // tick 2: a fresh a.com page must overflow against the FOLDED count
    val tick2 = Seq(
      (11L, "an entirely new a.com page describing tidal bores",
        "http://a.com/p11")).toDF("doc_id", "text", "url")
    val v2 = IngestLadder.admitBatch(tick2, "doc_id", "text",
        Some("url"), gates = Seq.empty, root = root, n = 3, tau = 0.9,
        batchId = 1L, domainQuota = Some(2))
      .as[(Long, Option[String])].collect().toMap
    assert(v2 == Map(11L -> Some("domain")), s"tick2 $v2")
  }

  test("rules-table quota: a subset-equal rules table reproduces the " +
      "scalar form verdict for verdict; the *.ck wildcard splits a " +
      "registrant the subset merges (different drops, by design)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "http://s1.farm0.co.uk/a"), (2L, "http://s2.farm0.co.uk/b"),
      (3L, "http://s3.farm0.co.uk/c"),
      (4L, "http://shop0.stores.ck/x"), (5L, "http://shop1.stores.ck/y"),
      (6L, "http://shop2.stores.ck/z"),
      (7L, null.asInstanceOf[String])).toDF("doc_id", "url")
    def run(root: String, rules: Option[Seq[String]]): Map[Long, Option[String]] =
      IncrementalDedup.admitBatchDomainQuota(docs, "doc_id", "url",
          root, k = 2, batchId = 0L,
          pslRules = rules.map(_.toDF("rule")))
        .as[(Long, Option[String])].collect().toMap
    val scalar = run(tmp("dqp_s"), None)
    val subsetEq = run(tmp("dqp_e"),
      Some(graft.ext.Dedup.publicSuffixes))
    assert(subsetEq == scalar,
      s"subset-equal rules diverge: $subsetEq vs $scalar")
    // scalar/subset: no ck rule -> all shops merge into stores.ck,
    // rank 3 (doc 6) overflows; farm shards merge into farm0.co.uk
    assert(scalar == Map(1L -> None, 2L -> None, 3L -> Some("domain"),
      4L -> None, 5L -> None, 6L -> Some("domain"), 7L -> None),
      s"scalar $scalar")
    // full rules with *.ck: each shop is its own registrant, all three
    // admitted; the co.uk arm is unchanged
    val full = run(tmp("dqp_f"),
      Some(graft.ext.Dedup.publicSuffixes ++ Seq("*.ck")))
    assert(full == Map(1L -> None, 2L -> None, 3L -> Some("domain"),
      4L -> None, 5L -> None, 6L -> None, 7L -> None), s"full $full")
  }

  test("ingest ladder quota rung resolves through the rules table when " +
      "supplied: the *.ck shops stop sharing one bucket") {
    import spark.implicits._
    val docs = Seq(
      (1L, "distinct page text about one topic entirely",
        "http://shop0.stores.ck/x"),
      (2L, "another unrelated page body on a second topic",
        "http://shop1.stores.ck/y"),
      (3L, "a third page concerning something else again",
        "http://shop2.stores.ck/z")).toDF("doc_id", "text", "url")
    def run(root: String, rules: Option[org.apache.spark.sql.DataFrame]) =
      IngestLadder.admitBatch(docs, "doc_id", "text", Some("url"),
          gates = Seq.empty, root = root, n = 3, tau = 0.9,
          batchId = 0L, domainQuota = Some(1), pslRules = rules)
        .as[(Long, Option[String])].collect().toMap
    val subset = run(tmp("dqp_i_s"), None)
    assert(subset == Map(1L -> None, 2L -> Some("domain"),
      3L -> Some("domain")), s"subset $subset")
    val full = run(tmp("dqp_i_f"),
      Some((graft.ext.Dedup.publicSuffixes ++ Seq("*.ck")).toDF("rule")))
    assert(full == Map(1L -> None, 2L -> None, 3L -> None), s"full $full")
  }

  test("single-domain flood: with the DEFAULT monitor rung set, only " +
      "the domain rung's CUSUM alarms when one registrant floods past " +
      "its quota") {
    import spark.implicits._
    val root = tmp("dq_flood")
    // default rungs now include domain and lines; configured-off rungs
    // observe 0 and stay silent at mu = 0
    val mon = new graft.ext.LadderRungMonitor(
      mu = 0L, kappa = 500L, h = 2000L)
    // steady tick: three registrants, all under quota
    val steady = Seq(
      (1L, "page one text body alpha", "http://a.com/1"),
      (2L, "page two text body beta", "http://b.com/1"),
      (3L, "page three text body gamma", "http://c.com/1"))
      .toDF("doc_id", "text", "url")
    IngestLadder.admitBatch(steady, "doc_id", "text", Some("url"),
      gates = Seq.empty, root = root, n = 3, tau = 0.9, batchId = 0L,
      domainQuota = Some(2), monitor = Some(mon))
    assert(mon.latest.exists(t => t.alarmUp.isEmpty &&
      t.alarmDown.isEmpty), s"steady tick must not alarm: ${mon.latest}")
    // flood tick: twelve distinct flood.net pages; quota 2 (prior 0 for
    // that registrant) -> 10/12 drop at 'domain' (~8333 bp), every
    // other rung flat 0
    val flood = (21L to 32L).map(i =>
      (i, s"flood page number $i entirely distinct body text",
        s"http://flood.net/p$i")).toDF("doc_id", "text", "url")
    IngestLadder.admitBatch(flood, "doc_id", "text", Some("url"),
      gates = Seq.empty, root = root, n = 3, tau = 0.9, batchId = 1L,
      domainQuota = Some(2), monitor = Some(mon))
    val t = mon.latest.get
    assert(t.alarmUp == Set("domain") && t.alarmDown.isEmpty,
      s"flood tick alarms: $t")
    assert(t.dropBp("domain") > 8000L &&
      Seq("url", "lines", "exact", "near", "containment")
        .forall(t.dropBp(_) == 0L), s"rates: ${t.dropBp}")
  }

  test("down alarms are gated on rung activity: a configured-off rung's " +
      "flat 0 never pages at mu > 0; an active rung that flatlines " +
      "still does") {
    val mon = new graft.ext.LadderRungMonitor(
      rungs = Seq("url", "lines"), mu = 1000L, kappa = 0L, h = 1500L)
    // url drops 3000 bp once then flatlines (a genuine collapse);
    // lines never fires at all (the rung is configured off)
    mon.tick(0L, Map("n" -> 10L, "n_url" -> 3L, "n_lines" -> 0L))
    mon.tick(1L, Map("n" -> 10L, "n_url" -> 0L, "n_lines" -> 0L))
    mon.tick(2L, Map("n" -> 10L, "n_url" -> 0L, "n_lines" -> 0L))
    val downs = mon.ticks.flatMap(_.alarmDown).toSet
    assert(downs == Set("url"),
      s"only the once-active rung may down-alarm: $downs")
  }

  test("domainQuota without urlCol is rejected loudly") {
    import spark.implicits._
    val batch = Seq((1L, "some text")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      IngestLadder.admitBatch(batch, "doc_id", "text", None,
        gates = Seq.empty, root = tmp("dq3"), n = 3, tau = 0.5,
        batchId = 0L, domainQuota = Some(5))
    }
    assert(e.getMessage.contains("urlCol"))
  }
}
