package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level (whole-relation) text operators: TF-IDF term extraction,
  * vocabulary building, PII scrubbing, deterministic sampling.
  *
  * Scale shapes:
  *  - tf/df are two aggregations over the exploded token relation — the
  *    shuffle key is the token (tf additionally the doc), map-side
  *    partial counts do most of the work;
  *  - the document count N and the df relation are small (vocabulary-
  *    sized) and broadcast back onto the per-doc term lists;
  *  - sampling and scrubbing are stateless projections/filters — no
  *    shuffle at all, fully pushdown-friendly.
  */
object Corpus {

  private def toks(textCol: Column): Column =
    TextOps.tokens(TextOps.normalized(textCol))

  /** Exploded (id, token) relation — duplicates preserved. */
  private def tokenRel(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(toks(col(textCol))).as("token"))

  /** Top-k TF-IDF terms per document: score = tf · ln(N/df), rounded to
    * 4dp, ranked by (score desc, token asc) so top-k cuts are total-order
    * deterministic in any engine.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val rel = tokenRel(df, idCol, textCol)
    val tf = rel.groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = rel.select(col("id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = df.select(countDistinct(col(idCol)).as("n"))
    val scored = tf.join(dfreq, "token").crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n").cast("double") / col("df")), 4))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("token").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("token"), col("score"))
  }

  /** Corpus vocabulary: the topN tokens by (frequency desc, token asc)
    * with their counts — the building block of BPE/vocab training runs.
    */
  def vocabulary(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    val counts = df.select(explode(toks(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("token").asc)
    // single-partition window over vocabulary-sized data (tokens, not
    // occurrences) — the heavy lifting happened in the count aggregate
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("rank"), col("token"), col("cnt"))
  }

  /** Scrub character runs matching `pattern` (default: digit runs —
    * stand-in for ids/phones/account numbers) with a placeholder.
    * Returns (scrubbed text column, hit count column) builders.
    */
  def scrub(textCol: Column, pattern: String = "[0-9]+",
            replacement: String = "<num>"): (Column, Column) =
    (regexp_replace(textCol, pattern, replacement),
      size(regexp_extract_all(textCol, lit(pattern), lit(0))))

  /** Deterministic hash sample: keep a row iff the portable 60-bit hash
    * of its key is below `pct`% of the hash space. Reproducible across
    * engines/runs (md5-based), stateless, no shuffle — unlike
    * `df.sample`, which is seed- and partitioning-dependent.
    */
  def hashSample(df: DataFrame, keyCols: Seq[String], pct: Int): DataFrame =
    df.filter(TextOps.portableHash(concat_ws(":", keyCols.map(col): _*))
      % 100 < pct)

  /** Sorted-neighborhood record linkage candidates: rank rows by a sort
    * key and pair each row with its `window` successors. O(n·window)
    * candidate pairs instead of the blocked join's per-block quadratic —
    * THE classic scale move for fuzzy matching when blocks are too
    * coarse. Deterministic (rank ties broken by id), so downstream
    * distance filters stay oracle-checkable. Single global sort; at
    * cluster scale use rangepartitioned sort (Spark's default for
    * window-without-partition is a single partition — acceptable for
    * key-cardinality-bounded inputs, else pre-block and apply per block).
    */
  def sortedNeighborhood(df: DataFrame, sortCols: Seq[String],
                         idCol: String, window: Int): DataFrame = {
    val w = Window.orderBy((sortCols.map(col) :+ col(idCol)).map(_.asc): _*)
    val ranked = df.withColumn("__rn", row_number().over(w))
    // equi-join on (successor rank - offset), NOT a rank-range predicate:
    // a range join without an equality key plans as a nested loop
    val a = ranked.as("a")
    val b = ranked
      .withColumn("__k", explode(sequence(lit(1), lit(window))))
      .withColumn("__rn_pred", col("__rn") - col("__k"))
      .as("b")
    a.join(b, col("a.__rn") === col("b.__rn_pred"))
  }

  /** Stratified quota sample: exactly `quota` rows per stratum (fewer if
    * the stratum is smaller), chosen by portable-hash order — a
    * deterministic "reservoir" that balances a skewed corpus (the
    * per-source / per-language cap step of corpus curation). One shuffle
    * on the strata; `WindowGroupLimit` prunes each partition to the
    * quota before the final sort.
    */
  def quotaSample(df: DataFrame, strataCols: Seq[String],
                  keyCols: Seq[String], quota: Int): DataFrame = {
    val h = TextOps.portableHash(concat_ws(":", keyCols.map(col): _*))
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy((h +: keyCols.map(col)).map(_.asc): _*)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
  }
}
