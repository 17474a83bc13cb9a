package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM-LM tokenizer (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates") — the BPE alternative every
  * tokenizer-fertility comparison needs: where BPE composes greedy
  * merges bottom-up, the unigram model scores each piece independently
  * and segments a word with the minimum-total-cost (max-probability)
  * piece cover, found by Viterbi.
  *
  * Determinism/oracle discipline: piece costs are integer
  * tenth-millinats, cost_p = ⌊−ln(c_p/C)·10⁴ + 0.5⌋ with c_p, C exact
  * integer counts — the [[Corpus.dsirScore]] fixed-point rule, so
  * Viterbi runs on longs and every segmentation decision (ties to the
  * LONGEST piece) replays exactly in DuckDB via recursive CTEs over
  * positions. EM is the HARD variant (Viterbi counts, not
  * forward-backward expectations): published SentencePiece uses soft
  * EM, but the soft posteriors are float sums whose accumulation order
  * an oracle cannot replay — hard EM converges to comparable vocab and
  * keeps the bit-exactness contract this library is built on.
  *
  * Scale shapes: seeding is one substring explode + count (shuffle on
  * the piece string, ≤ maxPieceLen·len rows per word occurrence) with a
  * TakeOrdered top-k; an EM round is one [[encode]] pass (stateless,
  * per-row native expression with the vocabulary as a broadcast-sized
  * reference object) + one piece-count aggregate — no driver state
  * beyond the vocabulary itself ([[Bpe.learn]]'s gate discipline).
  */
object Unigram {

  /** Vocabulary-size gate for the driver collect: a unigram vocab is
    * driver-sized BY DEFINITION (it rides into every task as one
    * literal), but an unbounded collect of a mis-specified piece table
    * should fail loudly, not OOM — the [[Dedup.connectedComponents]]
    * explicit-gate discipline.
    */
  private val MaxVocabCollect = 1000000L

  private def words(df: DataFrame, textCol: String): DataFrame =
    Materialize.spread(df).select(
      explode(TextOps.tokens(TextOps.normalized(col(textCol)))).as("w"))

  /** Seed vocabulary: every within-word substring of length
    * 1..maxPieceLen, counted over word OCCURRENCES (so frequent words
    * weigh their pieces up — SentencePiece seeds from suffix-array
    * substring frequencies the same way), keeping the `maxVocab` most
    * frequent (count desc, piece asc — deterministic) PLUS every
    * observed single character (feasibility: any word must be
    * segmentable). Costs from the kept mass: ⌊−ln(cnt/C)·10⁴ + 0.5⌋.
    *
    * @return (piece, cnt, nat10k)
    */
  def seedVocab(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
                maxVocab: Int = 200): DataFrame = {
    require(maxPieceLen >= 1 && maxVocab >= 1,
      s"bad seed dials: maxPieceLen=$maxPieceLen maxVocab=$maxVocab")
    val subs = words(df, textCol).select(explode(flatten(
      transform(sequence(lit(1), length(col("w"))), s =>
        transform(
          sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - s + 1)),
          l => col("w").substr(s, l))))).as("piece"))
    val cnts = Materialize.multiScan(
      subs.groupBy(col("piece")).agg(count(lit(1)).as("cnt")))
    val top = cnts.orderBy(col("cnt").desc, col("piece").asc).limit(maxVocab)
    val vocab0 = top.unionByName(cnts.filter(length(col("piece")) === 1))
      .dropDuplicates("piece")
    costed(vocab0)
  }

  /** Attach ⌊−ln(cnt/C)·10⁴+0.5⌋ costs, C = the table's total mass. */
  private def costed(counts: DataFrame): DataFrame =
    counts.crossJoin(broadcast(counts.agg(sum(col("cnt")).as("ctot"))))
      .select(col("piece"), col("cnt"),
        floor(-log(col("cnt").cast("double") / col("ctot").cast("double"))
          * 10000 + 0.5).cast("long").as("nat10k"))

  /** Collect a (piece, cnt?, nat10k) vocabulary table for the literal
    * ride-along — gated, deterministic order irrelevant (hash lookup).
    */
  private def collectVocab(vocab: DataFrame): Seq[(String, Long)] = {
    val n = vocab.count()
    require(n <= MaxVocabCollect,
      s"unigram vocabulary has $n rows (> $MaxVocabCollect) — not a " +
        "piece table; check the input")
    vocab.select(col("piece"), col("nat10k"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Unigram pieces of the normalized text as `array<string>` — the
    * native Viterbi expression ([[graft.functions.UnigramTable]]), the
    * vocabulary riding as ONE reference object. Unknown single
    * characters cost `unkNat10k` (segmentation always feasible).
    */
  def encode(text: Column, vocab: Seq[(String, Long)],
             unkNat10k: Long = 200000L): Column =
    graft.functions.VectorFunctions.unigramEncode(
      TextOps.normalized(text), vocab, unkNat10k)

  /** One HARD-EM round: segment the corpus under the current costs,
    * count piece usage (over word occurrences), re-estimate costs from
    * the usage mass. Pieces the Viterbi never uses DROP OUT — the EM
    * prune that shrinks the seed toward the final vocabulary.
    *
    * @param vocab (piece, nat10k) current table (extra columns ignored)
    * @return (piece, cnt, nat10k) re-estimated
    */
  def emRound(df: DataFrame, textCol: String, vocab: DataFrame,
              unkNat10k: Long = 200000L): DataFrame = {
    val v = collectVocab(vocab)
    graft.functions.VectorFunctions.register(df.sparkSession)
    val used = Materialize.spread(df)
      .select(explode(encode(col(textCol), v, unkNat10k)).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
    costed(used)
  }

  /** Per-document tokenizer-fertility card under a unigram vocabulary
    * — the [[Bpe]] fertility card's family sibling, so a corpus can
    * compare BPE vs unigram pieces-per-word on identical text:
    * (id, n_words, n_pieces, fertility_bp = ⌊10⁴·pieces/words⌋).
    * Zero-word docs report zeros (not dropped — the card is per-doc).
    */
  def fertility(df: DataFrame, idCol: String, textCol: String,
                vocab: DataFrame, unkNat10k: Long = 200000L): DataFrame = {
    val v = collectVocab(vocab)
    graft.functions.VectorFunctions.register(df.sparkSession)
    Materialize.spread(df).select(col(idCol).as("id"),
        size(TextOps.tokens(TextOps.normalized(col(textCol)))).cast("long")
          .as("n_words"),
        size(encode(col(textCol), v, unkNat10k)).cast("long").as("n_pieces"))
      .select(col("id"), col("n_words"), col("n_pieces"),
        when(col("n_words") > 0,
          expr("(n_pieces * 10000) div n_words")).otherwise(0L)
          .as("fertility_bp"))
  }
}
