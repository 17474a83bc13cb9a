package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Design for 100 TB: every variant avoids the O(n²) all-pairs join.
  *   - exact: shuffle 32-byte digests, not documents.
  *   - jaccard: inverted shingle index — only documents sharing a shingle
  *     ever meet; the shuffle key is the shingle.
  *   - minhash: fixed-width signatures + band buckets — candidate pairs
  *     are generated per bucket, never globally.
  *   - simhash: 64-bit signature + band tables for hamming-radius search.
  *
  * Hashing uses [[TextOps.portableHash]]/[[TextOps.portableHash32]]
  * (md5-derived) so results are reproducible in any engine — required by
  * the DuckDB oracle and handy for cross-system validation in general.
  */
object Dedup {

  /** 32-bit portable hash (first 8 hex chars of md5) — small enough that
    * `a*h+b` stays within a 63-bit long for the MinHash mod-prime family.
    */
  def portableHash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Mersenne prime 2^61-1: modulus of the universal hash family. */
  val MinhashPrime: Long = (1L << 61) - 1

  /** Deterministic hash-family parameters (a_i, b_i) for i < k.
    * Generated from a fixed LCG so Scala and the oracle SQL agree.
    */
  def hashParams(k: Int): Seq[(Int, Long, Long)] = {
    var s = 42L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s }
    (0 until k).map(i => (i, (next() % 536870911L) + 1L, next() % 2147483647L))
  }

  /** Distinct word n-gram shingles of the normalized text. */
  def wordShingles(text: Column, n: Int): Column = {
    val words = split(TextOps.normalized(text), " ")
    val cnt = size(words) - (n - 1)
    when(cnt > 0,
      array_distinct(transform(sequence(lit(0), cnt - 1),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup groups: one row per distinct normalized content with the
    * surviving (minimum) id and the duplicate count. Grouping key is the
    * md5 fingerprint so the shuffle carries 32 bytes per doc.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** All document pairs with shingle-Jaccard ≥ tau, via an inverted
    * shingle index (explode → self-join on shingle → count common).
    * Exact (no approximation): used directly at moderate scale and as
    * the verification step after MinHash candidate generation.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, tau: Double): DataFrame = {
    val sh = df.select(col(idCol).as("id"), wordShingles(col(textCol), n).as("sh"))
      .select(col("id"), size(col("sh")).as("m"), explode(col("sh")).as("shingle"))
    val a = sh.as("a")
    val b = sh.as("b")
    a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.m").as("m_a"), col("b.m").as("m_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jacc", round(col("inter").cast("double") /
        (col("m_a") + col("m_b") - col("inter")), 4))
      .filter(col("jacc") >= tau)
      .select(col("id_a"), col("id_b"), col("jacc"))
  }

  /** MinHash signatures: one row per doc with `sig` = array of k minima
    * of the universal hash family over the doc's shingle set.
    *
    * Relational formulation (no UDAF): explode shingles, broadcast-join
    * the k hash params, aggregate min per (doc, hash-index), then fold
    * the k minima back into an ordered array. Three narrow shuffles on
    * (doc, hidx) / doc — each row is a handful of longs, so this scales
    * to billions of documents.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val params = spark.createDataset(hashParams(k)).toDF("hidx", "ha", "hb")
    df.select(col(idCol).as("id"), explode(wordShingles(col(textCol), n)).as("shingle"))
      .withColumn("h32", portableHash32(col("shingle")))
      .crossJoin(broadcast(params))
      .withColumn("hv", (col("ha") * col("h32") + col("hb")) % MinhashPrime)
      .groupBy(col("id"), col("hidx")).agg(min(col("hv")).as("mh"))
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("hidx"), col("mh")))),
        s => s.getField("mh")).as("sig"))
  }

  /** MinHash-LSH candidate pairs: band the signature into `bands` groups
    * of `k/bands` rows, bucket on (band index, band slice), and emit
    * pairs that collide in ≥1 band, with the signature-agreement estimate
    * of Jaccard. Follows the classic MMDS banding scheme.
    */
  def minhashCandidates(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => slice(col("sig"), b * rows + 1, lit(rows)))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_sig")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_sig") === col("b.band_sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("est_jacc", round(
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / k, 4))
      .select(col("id_a"), col("id_b"), col("est_jacc"))
  }

  /** 60-bit SimHash of the token multiset: per bit j, sum +1/-1 over
    * token hashes' bit j, take the sign. Computed per-document with
    * array higher-order functions — no per-bit shuffle.
    */
  def simhash64(text: Column): Column = {
    val hashes = transform(TextOps.tokens(TextOps.normalized(text)),
      t => TextOps.portableHash(t))
    val counts = aggregate(hashes,
      array_repeat(lit(0L), 60),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(59)),
        (c, j) => c + call_function("shiftright", h, j) % 2 * 2 - 1))
    aggregate(zip_with(counts, sequence(lit(0), lit(59)),
      (c, j) => when(c > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

  /** SimHash near-dup pairs within hamming distance `maxDist`, using the
    * pigeonhole band trick: split the 60-bit signature into `maxDist+1`
    * bands; any pair within the radius must agree exactly on ≥1 band, so
    * candidates come from band-bucket joins, never all-pairs.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int): DataFrame = {
    val nBands = maxDist + 1
    val bandBits = 60 / nBands
    val sigs = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => call_function("shiftright", col("sig"), b * bandBits) % (1L << bandBits))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
