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
