package graft
// (train/eval splits, shard export, corpus diff)

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Corpus, Dedup, Splits}

class SplitsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val w801010 =
    Seq("train" -> 800000, "val" -> 100000, "test" -> 100000)

  test("hashSplit: deterministic, partitioning-invariant, stateless plan") {
    val docs = Tables.documents(spark, sf)
    val a = Splits.hashSplit(docs, Seq("doc_id"), w801010)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Splits.hashSplit(docs.repartition(13), Seq("doc_id"), w801010)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "assignment depends on partitioning")
    // realized proportions: binomial around each weight (6 sigma)
    val n = a.size.toDouble
    w801010.foreach { case (name, ppm) =>
      val p = ppm / 1e6
      val got = a.values.count(_ == name) / n
      val sigma = math.sqrt(p * (1 - p) / n)
      assert(math.abs(got - p) <= 6 * sigma,
        s"$name: realized $got vs expected $p (sigma $sigma)")
    }
    // stateless: no exchange anywhere in the plan
    val plan = Splits.hashSplit(docs, Seq("doc_id"), w801010)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashSplit shuffles:\n$plan")
  }

  test("hashSplit: membership is stable under corpus growth") {
    val docs = Tables.documents(spark, sf)
    val subset = docs.filter(col("doc_id") % 3 === 0)
    val full = Splits.hashSplit(docs, Seq("doc_id"), w801010)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sub = Splits.hashSplit(subset, Seq("doc_id"), w801010)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (id, s) =>
      assert(full(id) == s, s"doc $id moved split when the corpus grew")
    }
  }

  test("hashSplit: weight validation") {
    val docs = Tables.documents(spark, sf)
    intercept[IllegalArgumentException] {
      Splits.hashSplit(docs, Seq("doc_id"), Seq("a" -> 500000, "b" -> 400000))
    }
    intercept[IllegalArgumentException] {
      Splits.hashSplit(docs, Seq("doc_id"),
        Seq("a" -> 500000, "a" -> 500000))
    }
    intercept[IllegalArgumentException] {
      Splits.hashSplit(docs, Seq("doc_id"),
        Seq("a" -> 1100000, "b" -> -100000))
    }
  }

  test("exactSplit: per-stratum counts are exact to the floor") {
    val docs = Tables.documents(spark, sf)
    val assigned = Splits.exactSplit(docs, Seq("doc_id"), w801010,
      strata = Seq("lang"))
    val counts = assigned.groupBy("lang", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      val train = counts.getOrElse((lang, "train"), 0L)
      val vl = counts.getOrElse((lang, "val"), 0L)
      val ts = counts.getOrElse((lang, "test"), 0L)
      assert(train == n * 800000L / 1000000L,
        s"$lang train: $train of $n")
      assert(train + vl == n * 900000L / 1000000L,
        s"$lang train+val: ${train + vl} of $n")
      assert(train + vl + ts == n, s"$lang total")
    }
  }

  test("exactSplit: global (strata-free) form and null strata") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val global = Splits.exactSplit(docs, Seq("doc_id"), w801010)
    assert(global.filter(col("split") === "train").count()
      == n * 800000L / 1000000L)
    // NULL stratum rows form their own stratum (null-safe join), like
    // stratifiedNtile
    import spark.implicits._
    val withNull = Seq((1L, "a"), (2L, "a"), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String])).toDF("id", "s")
    val out = Splits.exactSplit(withNull, Seq("id"),
      Seq("x" -> 500000, "y" -> 500000), strata = Seq("s"))
    assert(out.count() == 4, "null-stratum rows dropped by the stats join")
    val nullRows = out.filter(col("s").isNull)
    assert(nullRows.filter(col("split") === "x").count() == 1)
    assert(nullRows.filter(col("split") === "y").count() == 1)
  }

  test("kFold: balanced folds, global form, determinism") {
    val docs = Tables.documents(spark, sf)
    val folded = Splits.kFold(docs, Seq("doc_id"), k = 4,
      strata = Seq("lang"))
    val byLang = folded.groupBy("lang", "fold").count()
      .collect().groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      val counts = rows.map(_.getLong(2))
      assert(rows.map(_.getInt(1)).toSet.subsetOf((1 to 4).toSet))
      assert(counts.max - counts.min <= 1, s"$lang folds: ${counts.toSeq}")
    }
    // global (strata-free) form balances over the whole corpus
    val global = Splits.kFold(docs, Seq("doc_id"), k = 3)
    assert(!global.columns.contains("__fold_g"))
    val gc = global.groupBy("fold").count().collect().map(_.getLong(1))
    assert(gc.max - gc.min <= 1, s"global folds: ${gc.toSeq}")
    // deterministic under input partitioning
    val a = folded.select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Splits.kFold(docs.repartition(9), Seq("doc_id"), k = 4,
        strata = Seq("lang")).select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("clusterSplit: near-dup clusters are atomic; certificate is empty") {
    import spark.implicits._
    // 3 near-dup groups + singletons: group members share a long base
    // string with a tiny suffix tweak (Jaccard >= 0.25 at n=3)
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = (
      Seq((1L, s"$base alpha"), (2L, s"$base beta"), (3L, s"$base gamma")) ++
      Seq((10L, s"other $base x"), (11L, s"other $base y")) ++
      Seq((20L, "completely different text entirely"),
          (21L, "nothing shared here at all today"))
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.25)
      .select("id_a", "id_b")
    assert(pairs.count() >= 4, "fixture must produce near-dup pairs")
    val assigned = Splits.clusterSplit(docs, pairs, "doc_id", w801010)
    // every cluster maps to exactly one split
    val perCluster = assigned.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("k"))
    assert(perCluster.filter(col("k") > 1).count() == 0,
      "a cluster straddles splits")
    // singletons are their own cluster
    val singletons = assigned.filter(col("doc_id").isin(20L, 21L))
      .select("doc_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    singletons.foreach { case (id, c) => assert(id == c, s"singleton $id") }
    // the certificate: empty for clusterSplit over the same relation
    assert(Splits.crossSplitPairs(pairs,
      assigned.select("doc_id", "split"), "doc_id", "split").count() == 0)
    // ...and NOT empty for an adversarial assignment separating a pair
    val forced = docs.select(col("doc_id"),
      when(col("doc_id") === 1L, "test").otherwise("train").as("split"))
    assert(Splits.crossSplitPairs(pairs, forced, "doc_id", "split")
      .count() > 0)
  }

  test("shardExport: exact shard sizes and a true permutation") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val size = 32L
    val out = Splits.shardExport(docs, Seq("doc_id"), size)
    val ranks = out.select(col("shard") * size + col("pos"))
      .collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq == (0L until n).toSeq,
      "shard*size+pos is not a permutation of 0..n-1")
    val sizes = out.groupBy("shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = n / size
    (0L until full).foreach(s => assert(sizes(s) == size, s"shard $s"))
    if (n % size != 0) assert(sizes(full) == n % size, "last shard")
    // deterministic under input partitioning
    val again = Splits.shardExport(docs.repartition(7), Seq("doc_id"), size)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val first = out.select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == first)
  }

  test("writeShards: one file per shard directory, rows in pos order") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val out = Splits.shardExport(docs, Seq("doc_id"), 16L)
    val dir = Files.createTempDirectory("graft_shards").toString
    Splits.writeShards(out, dir, 16L)
    val root = new java.io.File(dir)
    val shardDirs = root.listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"${d.getName}: ${parts.length} part files, want 1")
    }
    // reading one shard back yields pos order (single file => file order)
    val one = spark.read.parquet(s"$dir/shard=1")
      .select("pos").collect().map(_.getLong(0)).toSeq
    assert(one == one.sorted, "shard rows not in pos order")
    // nothing lost
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  test("mixingPlan: exact integer targets, epochs, missing-source alert") {
    import spark.implicits._
    val docs = Seq(
      ("a", 600L), ("a", 400L),   // avail 1000
      ("b", 250L)                 // avail 250
    ).toDF("source", "toks")
    // budget 2_500_007: bq = 2, br = 500007
    val plan = Corpus.mixingPlan(docs, "source", "toks",
      Seq("a" -> 600000, "b" -> 300000, "ghost" -> 100000), 2500007L)
      .collect().map(r => r.getString(0) -> r).toMap
    // a: 2*600000 + (500007*600000) div 1e6 = 1200000 + 300004
    assert(plan("a").getLong(3) == 1500004L)
    assert(plan("a").getDouble(4) == 1500.004, "epochs = target/avail 4dp")
    // b: 2*300000 + (500007*300000) div 1e6 = 600000 + 150002
    assert(plan("b").getLong(3) == 750002L)
    assert(plan("b").getDouble(4) == 3000.008)
    // ghost: target computed, avail/epochs NULL — the alert path
    assert(plan("ghost").getLong(3) == 250000L)
    assert(plan("ghost").isNullAt(2) && plan("ghost").isNullAt(4))
    intercept[IllegalArgumentException] {
      Corpus.mixingPlan(docs, "source", "toks", Seq("a" -> 999999), 1L)
    }
  }

  test("appendShards: committed shards untouched, tail tops up, append continues") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val a = docs.filter(col("doc_id") % 5 =!= 0)
    val b = docs.filter(col("doc_id") % 5 === 0)
    val size = 24L
    val nA = a.count(); val nB = b.count()
    assert(nA % size != 0, "fixture must leave a partial tail shard")
    val dir = Files.createTempDirectory("graft_appsh").toString
    Splits.writeShards(Splits.shardExport(a, Seq("doc_id"), size), dir, size)
    def snapshot(): Map[String, Seq[(String, String)]] =
      new java.io.File(dir).listFiles.filter(_.getName.startsWith("shard="))
        .map(d => d.getName -> d.listFiles
          .filter(_.getName.endsWith(".parquet")).toSeq
          .map(f => f.getName -> java.util.Base64.getEncoder.encodeToString(
            java.security.MessageDigest.getInstance("MD5")
              .digest(Files.readAllBytes(f.toPath))))
          .sortBy(_._1)).toMap
    def shardCounts(): Map[Long, Long] = spark.read.parquet(dir)
      .groupBy(col("shard").cast("long").as("shard")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = snapshot()
    val Some((from1, to1)) =
      Splits.appendShards(dir, b, Seq("doc_id"), size)
    assert((from1, to1) == ((nA / size, (nA + nB - 1) / size)))
    val after = snapshot()
    // every pre-existing part file untouched (same name, same CONTENT
    // — md5 of the bytes, so a same-length rewrite can't slip through)
    before.foreach { case (shard, files) =>
      files.foreach { case (name, digest) =>
        assert(after(shard).contains(name -> digest),
          s"$shard/$name rewritten by append") }
    }
    val total = nA + nB
    val expected = ((0L until total / size).map(_ -> size) ++
      (if (total % size != 0) Seq((total / size) -> total % size)
       else Nil)).toMap
    assert(shardCounts() == expected, s"shard sizes: ${shardCounts()}")
    // the topped-up tail shard's pos is contiguous across its part files
    val tailShard = nA / size
    val tailN = expected(tailShard)
    val posTail = spark.read.parquet(s"$dir/shard=$tailShard")
      .select("pos").collect().map(_.getLong(0)).sorted.toSeq
    assert(posTail == (0L until tailN).toSeq, s"tail pos: $posTail")
    // a second append continues from the new tail, old files untouched
    val more = (9001L to 9005L).map(i => (i, s"extra doc $i"))
      .toDF("doc_id", "text")
    val beforeTwo = snapshot()
    val Some((from2, to2)) =
      Splits.appendShards(dir, more, Seq("doc_id"), size)
    assert((from2, to2) == ((total / size, (total + 4) / size)))
    val afterTwo = snapshot()
    beforeTwo.foreach { case (shard, files) =>
      files.foreach { case (name, digest) =>
        assert(afterTwo(shard).contains(name -> digest)) }
    }
    assert(spark.read.parquet(dir).count() == total + 5)
    // empty batch: None, nothing written
    assert(Splits.appendShards(dir, more.filter(lit(false)),
      Seq("doc_id"), size).isEmpty)
    assert(snapshot() == afterTwo, "empty append must write nothing")
    // a mismatched shardSize is refused, not silently corrupting
    intercept[IllegalArgumentException] {
      Splits.appendShards(dir, more, Seq("doc_id"), size / 2)
    }
  }

  test("appendShards: manifest catches a mismatched dial even on a single-shard layout") {
    import spark.implicits._
    // 50 rows at dial 64 → ONE partial shard. An append at dial 100
    // passes every content fingerprint (tail fill 50 <= 100, no second
    // shard to check) — only the persisted manifest can refuse it.
    val a = (1L to 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft_shdial").toString
    Splits.writeShards(Splits.shardExport(a, Seq("doc_id"), 64L), dir, 64L)
    val b = (100L to 104L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Splits.appendShards(dir, b, Seq("doc_id"), 100L)
    }
    assert(e.getMessage.contains("manifest"), e.getMessage)
    // the matching dial still appends fine
    assert(Splits.appendShards(dir, b, Seq("doc_id"), 64L).nonEmpty)
    assert(spark.read.parquet(dir).count() == 55L)
    // a legacy layout without a manifest is refused outright, not
    // silently dial-inferred
    val legacy = Files.createTempDirectory("graft_shlegacy").toString
    Splits.writeShards(Splits.shardExport(a, Seq("doc_id"), 64L), legacy, 64L)
    val fs = new org.apache.hadoop.fs.Path(legacy)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(legacy, "_graft_shards.json"), false)
    val e2 = intercept[IllegalArgumentException] {
      Splits.appendShards(legacy, b, Seq("doc_id"), 64L)
    }
    assert(e2.getMessage.contains("manifest"), e2.getMessage)
    // an append that CREATES the layout writes the manifest too, so the
    // next append is guarded the same way
    val fresh = Files.createTempDirectory("graft_shfresh").toString + "/sub"
    assert(Splits.appendShards(fresh, a, Seq("doc_id"), 64L).nonEmpty)
    intercept[IllegalArgumentException] {
      Splits.appendShards(fresh, b, Seq("doc_id"), 100L)
    }
    assert(Splits.appendShards(fresh, b, Seq("doc_id"), 64L).nonEmpty)
  }

  test("hashSplit at admission time: streaming assignment == batch assignment") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the growth-stability property makes hashSplit the admission-time
    // split: whatever micro-batch a doc arrives in, it gets the split
    // the batch form would give it over the full corpus
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Long]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = in.toDS().toDF("doc_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       _: Long) =>
        val rows = Splits.hashSplit(batch, Seq("doc_id"), w801010)
          .select("doc_id", "split").collect()
          .map(r => r.getLong(0) -> r.getString(1))
        got.synchronized { got ++= rows }; ()
      }.start()
    in.addData(1L to 40L: _*)
    q.processAllAvailable()
    in.addData(41L to 80L: _*)
    q.processAllAvailable()
    q.stop()
    val batchForm = Splits.hashSplit((1L to 80L).toDF("doc_id"),
        Seq("doc_id"), w801010)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 80)
    got.foreach { case (id, s) =>
      assert(batchForm(id) == s, s"doc $id: stream $s vs batch ${batchForm(id)}")
    }
  }

  test("expandEpochs: replication + fractional admission, both mix sides") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, if (i <= 20) "rep" else "sub")).toDF("doc_id", "source")
    val out = Corpus.expandEpochs(docs, "source", Seq("doc_id"),
      Seq("rep" -> 2500000L, "sub" -> 500000L, "ghost" -> 3000000L))
      .select("doc_id", "epoch_copy").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySrc = out.groupBy { case (id, _) => if (id <= 20) "rep" else "sub" }
    // rep: every doc 2 or 3 copies, contiguous 0..k-1
    val repCounts = bySrc("rep").groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    repCounts.foreach { case (id, copies) =>
      assert(copies == (0L until copies.size).toSeq, s"doc $id: $copies")
      assert(copies.size == 2 || copies.size == 3, s"doc $id: $copies")
    }
    // expectation 2.5: realized total within the binomial band
    val repTotal = bySrc("rep").size
    assert(repTotal >= 20 * 2 && repTotal <= 20 * 3)
    // sub: 0 or 1 copies each; some docs absent (subsample), none > 1
    val subIds = bySrc.getOrElse("sub", Array.empty).map(_._1)
    assert(subIds.distinct.size == subIds.size, "sub doc duplicated")
    assert(subIds.size < 20 && subIds.nonEmpty, "0.5 epochs must drop some")
    // ghost rate targets no docs; docs with no rate (none here) drop —
    // and determinism under repartition
    val again = Corpus.expandEpochs(docs.repartition(7), "source",
      Seq("doc_id"),
      Seq("rep" -> 2500000L, "sub" -> 500000L, "ghost" -> 3000000L))
      .select("doc_id", "epoch_copy").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
    // a source absent from the rate table is out of the mix
    val dropped = Corpus.expandEpochs(docs, "source", Seq("doc_id"),
      Seq("rep" -> 1000000L))
    assert(dropped.count() == 20L)
  }

  test("diffNovelty: added near-dups of old content vs genuinely novel") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val oldSnap = Seq(
      (1L, s"$base original", "s1"),
      (2L, "some entirely separate old doc", "s1")
    ).toDF("doc_id", "text", "source")
    val newSnap = Seq(
      (1L, s"$base original", "s1"),       // kept: not an addition
      (10L, s"$base recrawl", "s1"),       // added, near-dup of old 1
      (11L, "fresh new content never seen before today", "s1"), // novel
      (12L, "another brand new document entirely here", "s2")   // novel
    ).toDF("doc_id", "text", "source")
    val out = Corpus.diffNovelty(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("s1") == ((2L, 1L, 1L, 0.5)), s"s1: ${out("s1")}")
    assert(out("s2") == ((1L, 0L, 1L, 1.0)), s"s2: ${out("s2")}")
  }

  test("corpusDiff: planted classes, byte delta, source moves") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "unchanged text", "s1"),
      (2L, "will change", "s1"),
      (3L, "will be removed", "s2"),
      (4L, "moves source", "s2"),
      (6L, "nulled out", "s4")      // text becomes NULL in new
    ).toDF("doc_id", "text", "source")
    val newSnap = Seq(
      (1L, "unchanged text", "s1"),
      (2L, "has changed!", "s1"),
      (4L, "moves source", "s3"),   // same content, new source
      (5L, "brand new doc", "s3"),
      (6L, null.asInstanceOf[String], "s4")
    ).toDF("doc_id", "text", "source")
    val diff = Corpus.corpusDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // s1: one unchanged, one changed (byte delta: 12 - 11 = 1)
    assert(diff("s1") == ((0L, 0L, 1L, 1L, 1L)), s"s1: ${diff("s1")}")
    // s2: doc 3 removed (-15 bytes); doc 4 now reports under s3
    assert(diff("s2") == ((0L, 1L, 0L, 0L, -15L)), s"s2: ${diff("s2")}")
    // s3: doc 4 (unchanged content, arrived from s2: delta 0) + doc 5
    // added (+13)
    assert(diff("s3") == ((1L, 0L, 0L, 1L, 13L)), s"s3: ${diff("s3")}")
    // s4: text -> NULL is a CHANGE (null-safe fp compare), delta -10
    assert(diff("s4") == ((0L, 0L, 1L, 0L, -10L)), s"s4: ${diff("s4")}")
  }

  test("curriculumExport: score order drives shards, tiebreak deterministic, partitioning-invariant") {
    import spark.implicits._
    // scores descending by id so hash-order and score-order differ
    val df = (1L to 10L).map(i => (i, 100L - i)).toDF("id", "score")
    val out = Splits.curriculumExport(df, Seq(col("score")), Seq("id"),
        shardSize = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    // score asc = id DESC: id 10 (score 90) is rank 1 -> shard 0 pos 0
    assert(out(10L) == ((0L, 0L)))
    assert(out(8L) == ((0L, 2L)))
    assert(out(7L) == ((1L, 0L)))
    assert(out(1L) == ((3L, 0L))) // 10 rows / 3 -> last shard partial
    // ties on score: key tiebreak decides, repartitioning doesn't
    val tied = (1L to 9L).map(i => (i, 5L)).toDF("id", "score")
    val a = Splits.curriculumExport(tied, Seq(col("score")), Seq("id"), 4)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    val b = Splits.curriculumExport(tied.repartition(7), Seq(col("score")),
        Seq("id"), 4)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("pos")))).toMap
    assert(a == b)
    assert(a(1L) == ((0L, 0L)) && a(9L) == ((2L, 0L)))
    intercept[IllegalArgumentException] {
      Splits.curriculumExport(df, Seq.empty, Seq("id"), 3)
    }
  }
}
