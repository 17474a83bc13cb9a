package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType,
  LongType, StructField, StructType}

/** Bounded buffer of the k smallest DISTINCT long values — the KMV
  * (k minimum values) distinct sketch. Mergeable (union + re-take
  * bottom-k), constant-size, so map-side partials shuffle k longs per
  * group instead of the group's whole distinct-value set: the property
  * that lets the estimator run as ONE aggregation at any group size,
  * replacing the distinct + per-group window formulation whose
  * parallelism was bounded by group count.
  *
  * Insertion keeps a sorted array: binary search + memmove — O(log k)
  * compare, O(k) move, k is small (64) and most rows fail the
  * `v < max` gate immediately once the buffer is warm.
  */
final class KmvBuffer(val k: Int) {
  val arr = new Array[Long](k)
  var n = 0

  def add(v: Long): Unit = {
    if (n == k && v >= arr(n - 1)) return // larger than current k-th min
    val pos = java.util.Arrays.binarySearch(arr, 0, n, v)
    if (pos >= 0) return // already present: DISTINCT semantics
    val ins = -(pos + 1)
    val last = if (n < k) n else k - 1
    if (ins <= last) {
      System.arraycopy(arr, ins, arr, ins + 1, last - ins)
      arr(ins) = v
      if (n < k) n += 1
    }
  }

  def merge(other: KmvBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.arr(i)); i += 1 }
  }
}

/** `kmv_bottomk(h, k)`: per group, the sorted array of the k smallest
  * distinct values of `h` (fewer if the group has fewer distinct values).
  * `element_at(result, k)` is the k-th smallest distinct hash — the KMV
  * estimator's order statistic; `size(result)` caps at k and is the
  * exact distinct count below it.
  */
case class KmvBottomK(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "kmv_bottomk"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOfRange(buf.arr, 0, buf.n))

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(k)
    buf.n = bb.getInt
    var i = 0
    while (i < buf.n) { buf.arr(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvBottomK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvBottomK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): KmvBottomK =
    copy(child = newChild)
}

/** `vec_sum_count(emb, dim)`: per group, the element-wise double sum of a
  * fixed-dim float/double vector column plus the row count — the k-means
  * centroid-update aggregate (centroid = sum/n, divided on the driver).
  * ONE double[dim+1] buffer per group replaces `dim` separate
  * `avg(embedding[i])` aggregate expressions, each of which re-evaluated
  * its own element extraction and carried its own partial-agg buffer
  * field per row — fine at dim 64, a plan/update blowup at the
  * 1024-4096 dims of production embeddings (the same disease the
  * simhash one-pass aggregate cured). Map-side partials shuffle
  * dim doubles + 1 count per group, so the corpus itself never moves.
  * Rows whose vector is null or not exactly `dim` wide are skipped.
  */
case class VecSumCount(child: Expression, dim: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  require(dim > 0, "dim must be positive")

  override def prettyName: String = "vec_sum_count"
  override def dataType: DataType = StructType(Seq(
    StructField("sum", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false

  private lazy val floatElems = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"vec_sum_count needs array<float|double>, got $t")
  }

  // slot `dim` holds the row count: one flat primitive buffer
  override def createAggregationBuffer(): Array[Double] = new Array[Double](dim + 1)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val ad = v.asInstanceOf[ArrayData]
      if (ad.numElements() == dim) {
        var i = 0
        if (floatElems) while (i < dim) { buf(i) += ad.getFloat(i); i += 1 }
        else while (i < dim) { buf(i) += ad.getDouble(i); i += 1 }
        buf(dim) += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i <= dim) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    InternalRow(new GenericArrayData(java.util.Arrays.copyOfRange(buf, 0, dim)),
      buf(dim).toLong)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (dim + 1))
    var i = 0
    while (i <= dim) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](dim + 1)
    var i = 0
    while (i <= dim) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): VecSumCount =
    copy(child = newChild)
}

/** `simhash_sig(h)`: the 60-bit SimHash signature in ONE pass — per input
  * hash, each of the 60 bit counters moves ±1 in a tight primitive loop
  * over an int[60] buffer; eval folds the counter signs into the
  * signature long. Replaces 60 separate `sum` aggregate expressions,
  * each of which re-evaluated its own shift/mask projection and its own
  * partial-agg buffer field per row (the round-2 1.7× regression).
  * Identical semantics: sum over ALL tokens (duplicates included) of
  * ±1 per bit, bit j of the result set iff the sum is positive.
  */
case class SimhashSig(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def prettyName: String = "simhash_sig"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Int] = new Array[Int](60)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 60) {
        buf(j) += ((((h >>> j) & 1L) << 1) - 1).toInt
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 60) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < 60) { if (buf(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 60)
    var j = 0
    while (j < 60) { bb.putInt(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Int](60)
    var j = 0
    while (j < 60) { buf(j) = bb.getInt; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): SimhashSig =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimhashSig =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}
