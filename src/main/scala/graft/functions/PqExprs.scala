package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType,
  IntegerType}

/** Product-quantization kernels. A PQ codebook is `m` sub-codebooks of
  * `nCodes` codewords over `subDim = dim/m` dimensions
  * (`books[s][c][j]`); a vector encodes as m small codes — 8 bytes
  * replaces 256 bytes of floats at (m=8, nCodes=16, dim=64) — and
  * asymmetric-distance (ADC) search scores a candidate with m table
  * lookups instead of a dim-wide float loop. The driver-side helpers
  * here are the single implementation both `eval` and the generated
  * code call, so interpreted and codegen paths cannot diverge.
  */
object PqSupport {

  /** Per-subspace argmin-L2² code of `v` (ties → lower code index). */
  def encode(books: Array[Array[Array[Float]]], v: ArrayData): Array[Byte] = {
    val m = books.length
    val out = new Array[Byte](m)
    val n = v.numElements()
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val subDim = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val x = if (off + j < n) v.getFloat(off + j).toDouble else 0.0
          val diff = x - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      off += subDim
      s += 1
    }
    out
  }

  /** [[encode]] as an int[] — the training-loop form (posexplode-able). */
  def encodeInts(books: Array[Array[Array[Float]]], v: ArrayData): Array[Int] = {
    val bytes = encode(books, v)
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    out
  }

  /** ADC lookup table for query `q`: L2² of every codeword against the
    * query's subvector, packed as m·nCodes big-endian doubles. */
  def distTable(books: Array[Array[Array[Float]]], q: ArrayData): Array[Byte] = {
    val m = books.length
    val nCodes = books(0).length
    val bb = ByteBuffer.allocate(8 * m * nCodes)
    val n = q.numElements()
    var s = 0
    var off = 0
    while (s < m) {
      val book = books(s)
      val subDim = book(0).length
      var c = 0
      while (c < nCodes) {
        val cent = book(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val x = if (off + j < n) q.getFloat(off + j).toDouble else 0.0
          val diff = x - cent(j)
          d += diff * diff
          j += 1
        }
        bb.putDouble(d)
        c += 1
      }
      off += subDim
      s += 1
    }
    bb.array()
  }

  /** ADC distance: Σ_s table[s][code[s]] — m lookups, no float loop. */
  def adc(nCodes: Int, code: Array[Byte], table: Array[Byte]): Double = {
    val bb = ByteBuffer.wrap(table)
    var d = 0.0
    var s = 0
    while (s < code.length) {
      d += bb.getDouble(8 * (s * nCodes + (code(s) & 0xff)))
      s += 1
    }
    d
  }
}

/** `pq_encode(emb, books)`: the m-byte PQ code — the stored "index"
  * representation (32× smaller than the float vector at the default
  * geometry). The codebook is ONE reference object shared by all tasks;
  * whole-stage codegen calls straight into the primitive kernel.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any =
    PqSupport.encode(books, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqSupport.encode($ref, $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `pq_codes(emb, books)`: the same assignment as [[PqEncode]] but as
  * `array<int>` — posexplode-able, which is what the training loop
  * aggregates over (one job per Lloyd iteration for ALL subspaces).
  */
case class PqCodes(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(PqSupport.encodeInts(books, a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         graft.functions.PqSupport.encodeInts($ref, $a));""")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** `pq_dist_table(q_emb, books)`: the query-side ADC lookup table
  * (m·nCodes doubles as binary). Computed once per QUERY row, then every
  * candidate costs m byte-indexed lookups ([[PqAdc]]).
  */
case class PqDistTable(child: Expression, books: Array[Array[Array[Float]]])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_dist_table"

  override def nullSafeEval(a: Any): Any =
    PqSupport.distTable(books, a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", books, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqSupport.distTable($ref, $a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

/** `pq_adc(code, table, nCodes)`: the ADC distance between a stored code
  * and a query's lookup table — the hot loop of PQ search, m lookups per
  * (candidate, query) pair.
  */
case class PqAdc(left: Expression, right: Expression, nCodes: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any =
    PqSupport.adc(nCodes, a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqSupport.adc($nCodes, $a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
