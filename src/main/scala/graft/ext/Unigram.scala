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

  /** Piece-usage counts of one Viterbi segmentation pass over the
    * corpus — the E-step's sufficient statistic. */
  private def usageCounts(df: DataFrame, textCol: String,
                          vocab: Seq[(String, Long)],
                          unkNat10k: Long): DataFrame = {
    graft.functions.VectorFunctions.register(df.sparkSession)
    Materialize.spread(df)
      .select(explode(encode(col(textCol), vocab, unkNat10k)).as("piece"))
      .groupBy(col("piece")).agg(count(lit(1)).as("cnt"))
  }

  /** One HARD-EM round: segment the corpus under the current costs,
    * count piece usage (over word occurrences), re-estimate costs from
    * the usage mass. Pieces the Viterbi never uses DROP OUT — the EM
    * prune that shrinks the seed toward the final vocabulary.
    *
    * @param vocab (piece, nat10k) current table (extra columns ignored)
    * @return (piece, cnt, nat10k) re-estimated
    */
  def emRound(df: DataFrame, textCol: String, vocab: DataFrame,
              unkNat10k: Long = 200000L): DataFrame =
    costed(usageCounts(df, textCol, collectVocab(vocab), unkNat10k))

  /** The FULL learn loop — seed → (segment → count → prune → re-cost)
    * to fixpoint or `maxRounds`: the hard-EM reduction of
    * SentencePiece's train procedure (Kudo 2018 §3.2 trains soft-EM
    * with a likelihood-loss prune; the hard variant keeps the
    * `targetVocab` pieces carrying the LARGEST Viterbi usage mass —
    * count desc, piece asc, deterministic — which is the same signal
    * the likelihood loss ranks when posteriors concentrate, and stays
    * bit-replayable).
    *
    * Feasibility floor: single-character pieces NEVER leave the
    * vocabulary. A single the Viterbi stopped using (always absorbed
    * into longer pieces) keeps a count floor of 1 — the smoothing
    * convention that gives unseen-at-train-time arrangements a finite
    * cost instead of the unk penalty.
    *
    * Convergence: the loop stops when a round's pruned (piece, cnt)
    * table equals the previous round's — vocabularies are driver-sized
    * ([[collectVocab]]'s gate), so the fixpoint test is an exact
    * in-memory compare, not another Spark job. Per round: ONE encode
    * pass + one piece-count aggregate. Hitting `maxRounds` BEFORE the
    * fixpoint logs a loud warning (the [[Dedup.connectedComponents]]
    * loud-non-convergence discipline — but a pre-fixpoint vocabulary
    * is a usable tokenizer, not wrong labels, so this warns rather
    * than throws); callers that must distinguish converged from
    * truncated use [[learnWithStatus]].
    *
    * @return (piece, cnt, nat10k) — the frozen tokenizer table
    */
  def learn(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
            seedMax: Int = 200, targetVocab: Int = 100,
            maxRounds: Int = 4, unkNat10k: Long = 200000L): DataFrame =
    learnWithStatus(df, textCol, maxPieceLen, seedMax, targetVocab,
      maxRounds, unkNat10k)._1

  /** [[learn]] plus its convergence status: (vocab, roundsUsed,
    * converged). `converged = false` means the hard-EM loop was
    * truncated at `maxRounds` before reaching the fixpoint — the
    * vocabulary is the last round's (usable, deterministic) table, but
    * one more round would still change it.
    */
  def learnWithStatus(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
                      seedMax: Int = 200, targetVocab: Int = 100,
                      maxRounds: Int = 4,
                      unkNat10k: Long = 200000L): (DataFrame, Int, Boolean) = {
    require(maxRounds >= 1 && targetVocab >= 1,
      s"bad learn dials: maxRounds=$maxRounds targetVocab=$targetVocab")
    val spark = df.sparkSession
    import spark.implicits._
    val seed = seedVocab(df, textCol, maxPieceLen, seedMax)
    val singles = collectVocab(seed.filter(length(col("piece")) === 1))
      .map(_._1).toSet
    // counts as a driver table per round (vocab-sized by the gate)
    def vocabOf(counts: Seq[(String, Long)]): DataFrame =
      costed(counts.toDF("piece", "cnt"))
    var cur: Seq[(String, Long)] = Nil
    var vocab = seed
    var rounds = 0
    var done = false
    while (rounds < maxRounds && !done) {
      // bounded driver collect: Viterbi only ever emits vocab pieces or
      // single characters, so |usage| ≤ |vocab| + |alphabet| — and the
      // vocab side passed through collectVocab's explicit gate above
      val usage = usageCounts(df, textCol, collectVocab(vocab), unkNat10k)
        .as[(String, Long)].collect().toMap
      val kept = usage.toSeq
        .sortBy { case (p, c) => (-c, p) }.take(targetVocab)
      val keptSet = kept.map(_._1).toSet
      val next = (kept ++ singles.diff(keptSet).toSeq.sorted
          .map(s => (s, math.max(usage.getOrElse(s, 0L), 1L))))
        .sortBy(_._1)
      done = next == cur
      cur = next
      vocab = vocabOf(next)
      rounds += 1
    }
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"Unigram.learn: hard-EM loop truncated at maxRounds=$maxRounds " +
          "before the (piece, cnt) fixpoint — the returned vocabulary " +
          "is the last round's table, NOT converged; raise maxRounds " +
          "or use learnWithStatus to observe this programmatically")
    (vocab, rounds, done)
  }

  /** SUBWORD-REGULARIZATION encode (Kudo 2018 §3.2 — the reason the
    * unigram model exists): one draw per word occurrence from the
    * word's `nBest` lowest-cost segmentations, P^α-weighted
    * (alpha10k = α·10⁴) and seeded — bit-replayable because the k-best
    * DP is integer, the weights are fixed-point, and the draw is a
    * portable md5-prefix hash of (word, occurrence index, seed). See
    * [[graft.functions.UnigramSampler]] for the exact contract;
    * α → ∞ or nBest = 1 degenerates to [[encode]].
    */
  def sampleEncode(text: Column, vocab: Seq[(String, Long)],
                   unkNat10k: Long = 200000L, nBest: Int = 3,
                   alpha10k: Long = 5000L,
                   seed: String = "graft"): Column =
    graft.functions.VectorFunctions.unigramSample(
      TextOps.normalized(text), vocab, unkNat10k, nBest, alpha10k, seed)

  /** [[fertility]] under SAMPLED segmentation — the per-doc card that
    * quantifies what regularization adds: sampled pieces per word vs
    * the 1-best floor. One fixed draw (the seed) per run: a training
    * export re-draws per epoch by changing the seed, and every epoch's
    * draw is independently replayable.
    *
    * @return (id, n_words, n_pieces, n_pieces_sampled, fertility_bp,
    *         fertility_sampled_bp)
    */
  def fertilitySampled(df: DataFrame, idCol: String, textCol: String,
                       vocab: DataFrame, unkNat10k: Long = 200000L,
                       nBest: Int = 3, alpha10k: Long = 5000L,
                       seed: String = "graft"): DataFrame = {
    val v = collectVocab(vocab)
    graft.functions.VectorFunctions.register(df.sparkSession)
    Materialize.spread(df).select(col(idCol).as("id"),
        size(TextOps.tokens(TextOps.normalized(col(textCol)))).cast("long")
          .as("n_words"),
        size(encode(col(textCol), v, unkNat10k)).cast("long").as("n_pieces"),
        size(sampleEncode(col(textCol), v, unkNat10k, nBest, alpha10k, seed))
          .cast("long").as("n_pieces_sampled"))
      .select(col("id"), col("n_words"), col("n_pieces"),
        col("n_pieces_sampled"),
        when(col("n_words") > 0,
          expr("(n_pieces * 10000) div n_words")).otherwise(0L)
          .as("fertility_bp"),
        when(col("n_words") > 0,
          expr("(n_pieces_sampled * 10000) div n_words")).otherwise(0L)
          .as("fertility_sampled_bp"))
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
