package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Runtime half of [[UnigramEncodeExpr]]: a frozen unigram-LM piece
  * vocabulary (piece → integer cost in tenth-millinats, the
  * [[graft.ext.Corpus]] fixed-point convention) plus the per-word
  * Viterbi segmenter — the SentencePiece unigram model's inference
  * step (Kudo 2018, "Subword Regularization", §3: the segmentation a
  * unigram LM assigns is the max-probability = min-cost piece cover).
  *
  * ONE table instance rides the plan as a reference object (the
  * [[BpeTable]] / `NearestCentroid` pattern), so the expression tree
  * and generated code are O(1) in the vocabulary size.
  *
  * Viterbi, per whitespace word, over CODE POINTS (so a piece boundary
  * can never split a surrogate pair, and positions agree with
  * SQL-engine `substr` semantics):
  *
  *   dp[0] = 0
  *   dp[i] = min over len ∈ 1..min(maxPieceLen, i) of
  *           dp[i−len] + cost(word[i−len..i))
  *
  * where an UNKNOWN single code point costs `unkCost` (segmentation is
  * therefore always feasible) and unknown longer pieces are skipped.
  * Ties break to the LONGEST piece (candidates scanned in increasing
  * length with `<=` acceptance) — the deterministic rule the DuckDB
  * oracle replays with a CASE cascade checking longer lengths first.
  * Cost per word: O(len · maxPieceLen) hash lookups.
  */
final class UnigramTable(entries: Array[Array[String]], val unkCost: Long)
    extends Serializable {

  private val costs: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](entries.length * 2)
    var i = 0
    while (i < entries.length) {
      m.put(entries(i)(0), entries(i)(1).toLong)
      i += 1
    }
    m
  }

  /** Longest piece in code points — the DP lookback bound. */
  val maxPieceLen: Int = {
    var mx = 1
    var i = 0
    while (i < entries.length) {
      val l = entries(i)(0).codePointCount(0, entries(i)(0).length)
      if (l > mx) mx = l
      i += 1
    }
    mx
  }

  def size: Int = costs.size

  /** Cost lookup for the k-best sampler (null = not in vocab). */
  private[functions] def costOf(p: String): java.lang.Long = costs.get(p)

  /** All unigram pieces of the (already-normalized) text, across
    * whitespace words, in order.
    */
  def encode(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val it = s.toString.split("\\s+").iterator
    while (it.hasNext) {
      val w = it.next()
      if (w.nonEmpty) encodeWord(w, out)
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(word: String,
                         out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    // code points (surrogate-safe; positions match SQL substr)
    val cps = {
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.toArray
    }
    val n = cps.length
    val dp = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var best = Long.MaxValue
      var bestLen = 0
      var len = 1
      val maxLen = math.min(maxPieceLen, i)
      while (len <= maxLen) {
        val piece = cps.slice(i - len, i).mkString
        val c = costs.get(piece)
        val cand =
          if (c != null) dp(i - len) + c.longValue()
          else if (len == 1) dp(i - len) + unkCost
          else Long.MaxValue
        // <= so a longer piece wins cost ties (lengths scanned upward)
        if (cand != Long.MaxValue && cand <= best) {
          best = cand; bestLen = len
        }
        len += 1
      }
      dp(i) = best; bp(i) = bestLen
      i += 1
    }
    // walk back, then emit in order
    val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = n
    while (pos > 0) {
      val l = bp(pos)
      pieces += cps.slice(pos - l, pos).mkString
      pos -= l
    }
    var k = pieces.length - 1
    while (k >= 0) { out += UTF8String.fromString(pieces(k)); k -= 1 }
  }
}

/** N-BEST + SAMPLED segmentation — the actual point of the unigram LM
  * in Kudo 2018 (§3.2, subword regularization): instead of always the
  * 1-best Viterbi cover, draw a segmentation from the word's n-best
  * list with probability ∝ P(x)^α, exposing the model to segmentation
  * variants at training time (SentencePiece's `nbest_size > 1` mode —
  * the l∞-normalized n-best approximation of the full lattice draw,
  * which needs float forward sums no oracle can bit-replay).
  *
  * Everything here is integer/deterministic so the draw replays in any
  * engine:
  *  - K-BEST DP: dp[i] = the k lowest-cost (cost, len, prevRank) paths,
  *    candidate order (cost asc, len desc, prevRank asc) — rank 1
  *    extends the 1-best tie rule (longest piece), ranks are a total
  *    order, and every rank is a distinct segmentation by construction;
  *  - WEIGHTS: w_j = ⌊exp(−alpha10k·(c_j − c_1)/10⁸)·10⁶ + 0.5⌋ — the
  *    P^α weighting in fixed point (alpha10k = α·10⁴; c in
  *    tenth-millinats, so the exponent is exactly −α·Δnats); w_1 = 10⁶;
  *  - DRAW: t = md5-prefix-60-bit of "word:occ:seed" mod Σw (the
  *    [[graft.ext.TextOps.portableHash]] convention; occ = the word's
  *    0-based POSITION index among the input's non-empty words — NOT a
  *    per-word repeat counter, so the same word at positions 2 and 7
  *    hashes "w:2:seed" and "w:7:seed" — giving repeated words
  *    independent draws), chosen = first j with cumsum(w₁..w_j) > t.
  *
  * α → ∞ (or k = 1) degenerates to the 1-best encode; α = 0 draws
  * uniformly over the n-best.
  */
final class UnigramSampler(val table: UnigramTable, k: Int,
                           alpha10k: Long, seed: String)
    extends Serializable {
  require(k >= 1, s"nBest must be >= 1, got $k")
  require(alpha10k >= 0, s"alpha10k must be >= 0, got $alpha10k")

  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.take(8).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** The k best (cost, pieces) segmentations of one word, best first.
    * (private[graft] for the spec's reference comparison.) */
  private[graft] def kbestWord(word: String): Array[(Long, Array[String])] = {
    val cps = {
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.toArray
    }
    val n = cps.length
    // dp(i): up to k (cost, len, prevRank) entries, best first
    val dp = Array.fill(n + 1)(Array.empty[(Long, Int, Int)])
    dp(0) = Array((0L, 0, 0))
    var i = 1
    while (i <= n) {
      val cands = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
      var len = 1
      val maxLen = math.min(table.maxPieceLen, i)
      while (len <= maxLen) {
        val piece = cps.slice(i - len, i).mkString
        val c = table.costOf(piece)
        val pc =
          if (c != null) c.longValue()
          else if (len == 1) table.unkCost
          else -1L
        if (pc >= 0L) {
          var r = 0
          while (r < dp(i - len).length) {
            cands += ((dp(i - len)(r)._1 + pc, len, r))
            r += 1
          }
        }
        len += 1
      }
      dp(i) = cands.sortBy { case (c, l, r) => (c, -l, r) }.take(k).toArray
      i += 1
    }
    dp(n).map { case entry =>
      val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = n
      var cur = entry
      while (pos > 0) {
        val l = cur._2
        pieces += cps.slice(pos - l, pos).mkString
        pos -= l
        if (pos > 0) cur = dp(pos)(cur._3)
      }
      (entry._1, pieces.reverse.toArray)
    }
  }

  def encode(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var occ = 0
    val it = s.toString.split("\\s+").iterator
    while (it.hasNext) {
      val w = it.next()
      if (w.nonEmpty) {
        val paths = kbestWord(w)
        val base = paths(0)._1
        val wts = paths.map { case (c, _) =>
          math.floor(math.exp(-(c - base).toDouble * alpha10k / 1e8)
            * 1000000.0 + 0.5).toLong
        }
        val tot = wts.sum
        val chosen =
          if (tot <= 0L) 0
          else {
            val t = hash60(w + ":" + occ + ":" + seed) % tot
            var cum = 0L
            var j = 0
            while ({ cum += wts(j); cum <= t }) j += 1
            j
          }
        paths(chosen)._2.foreach(p => out += UTF8String.fromString(p))
        occ += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `unigram_sample(text, vocab, unk, nbest, alpha10k, seed)`: one
  * deterministic subword-regularization draw per word occurrence (see
  * [[UnigramSampler]]). Same table-as-reference-object plan shape as
  * [[UnigramEncodeExpr]].
  */
case class UnigramSampleExpr(child: Expression, sampler: UnigramSampler)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "unigram_sample"

  override def nullSafeEval(a: Any): Any =
    sampler.encode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramSampler", sampler,
      "graft.functions.UnigramSampler")
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSampleExpr =
    copy(child = newChild)
}

/** `unigram_encode(text, vocab, unk)`: unigram-LM (SentencePiece-style)
  * pieces of the normalized text as `array<string>`, driven by a frozen
  * piece-cost table ([[UnigramTable]]). The vocabulary arrives as a
  * foldable `array<array<string>>` literal of [piece, cost] rows and is
  * folded into one reference object at resolution time.
  */
case class UnigramEncodeExpr(child: Expression, table: UnigramTable)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override def nullSafeEval(a: Any): Any =
    table.encode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramTable", table,
      "graft.functions.UnigramTable")
    defineCodeGen(ctx, ev, c => s"$tableRef.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}
