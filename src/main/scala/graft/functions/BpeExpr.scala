package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Runtime half of [[BpeEncodeExpr]]: a learned merge table compiled to
  * a rank map, plus the per-row encoder. ONE instance rides the plan as
  * a reference object (cf. `NearestCentroid`'s centroid matrix), so the
  * expression tree — and the generated code — is O(1) in the table
  * size: a production 30k-merge vocabulary costs the same plan as a
  * 10-merge spec table.
  *
  * Encoding algorithm: the standard greedy lowest-rank-first loop
  * (GPT-2 `bpe.py`, Sennrich et al. 2016): repeatedly find the
  * adjacent symbol pair with the lowest merge rank present in the word
  * and merge ALL its occurrences left-to-right, until no learned pair
  * remains. Per word this is O(len · merges-applied) with a hash lookup
  * per adjacent pair — independent of the table size, which is what the
  * chained-`replace` builtin formulation ([[graft.ext.Bpe.encode]],
  * O(table size) per word) cannot offer. The two agree on any word
  * whose merge path is unambiguous (all of `BpeSpec`'s corpora, and any
  * table without dual-split symbol collisions); the builtin form is the
  * oracle surface, this is the scale path.
  */
final class BpeTable(pairs: Array[Array[String]]) extends Serializable {

  // pair-key separator = U+001F, the SAME wrap char Bpe.cleaned strips
  // from all input text — so no symbol can ever contain it and keys
  // like (a·b) vs (a'·'b') cannot collide. A separator the input may
  // carry (e.g. NUL in binary-junk scrapes) would let distinct pairs
  // share a key and silently apply the wrong merge rank.
  private val Sep = "\u001f"

  private val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      m.put(pairs(i)(0) + Sep + pairs(i)(1), i)
      i += 1
    }
    m
  }

  def size: Int = pairs.length

  // pre-tokenization = TextOps.bpeTokens, by construction (shared pattern)
  private val preToken =
    java.util.regex.Pattern.compile(graft.ext.TextOps.BpeTokenPattern)

  /** All BPE symbols of the (already-normalized) text, across words. */
  def encode(s: UTF8String): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val m = preToken.matcher(s.toString)
    while (m.find()) encodeWord(m.group(), out)
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(word: String,
                         out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    // split into code points (surrogate-safe, matches regex '.' units)
    var syms = {
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b
    }
    var continue = syms.length >= 2
    while (continue) {
      // lowest-ranked pair present in the word
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + Sep + syms(i + 1))
        if (r != null && r < bestRank) {
          bestRank = r; bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (bestA == null) continue = false
      else {
        // merge all occurrences left-to-right
        val next = scala.collection.mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestA && syms(j + 1) == bestB) {
            next += bestA + bestB; j += 2
          } else { next += syms(j); j += 1 }
        }
        syms = next
        continue = syms.length >= 2
      }
    }
    syms.foreach(t => out += UTF8String.fromString(t))
  }
}

/** `bpe_encode(text, merges)`: BPE symbols of the normalized text as
  * `array<string>`, driven by a learned merge table ([[BpeTable]]).
  * The merge table arrives as a foldable literal and is folded into one
  * reference object at resolution time — see [[BpeTable]] for the
  * algorithm and the scale rationale vs the chained-`replace` builtin
  * form.
  */
case class BpeEncodeExpr(child: Expression, table: BpeTable)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(a: Any): Any =
    table.encode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table,
      "graft.functions.BpeTable")
    defineCodeGen(ctx, ev, c => s"$tableRef.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
