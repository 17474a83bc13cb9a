package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequency sketch (the mergeable heavy-hitters summary):
  * at most `capacity` counters; when the map overflows, the batch prune
  * subtracts the overflow-th smallest count from every counter and drops
  * the non-positive ones — the classic decrement step amortized. The
  * standard guarantees (ε = 1/capacity, preserved under the sum-then-
  * prune merge): estimates UNDERCOUNT by at most N/capacity total
  * stream mass, and any item with true frequency > N/capacity is
  * guaranteed to survive — which is exactly the recall property a
  * candidates-then-exact-recount pipeline needs. Unlike a full groupBy,
  * the shuffle carries `capacity` counters per partition instead of
  * every distinct item: the move when distinct items (urls, shingles,
  * error strings) outnumber executor memory.
  */
final class MgBuffer(val capacity: Int) {
  val counts = new java.util.HashMap[String, Long](capacity * 2)

  def add(item: String, inc: Long): Unit = {
    counts.put(item, counts.getOrDefault(item, 0L) + inc)
    if (counts.size > capacity * 2) prune()
  }

  /** Shrink to ≤ capacity: subtract the overflow-th smallest count from
    * everyone, drop non-positives (one sort, amortized over inserts). */
  def prune(): Unit = {
    if (counts.size <= capacity) return
    val vals = new Array[Long](counts.size)
    val it = counts.values().iterator()
    var i = 0
    while (it.hasNext) { vals(i) = it.next(); i += 1 }
    java.util.Arrays.sort(vals)
    val cut = vals(counts.size - capacity - 1) // largest count to eliminate
    val entries = counts.entrySet().iterator()
    while (entries.hasNext) {
      val e = entries.next()
      val nv = e.getValue - cut
      if (nv <= 0) entries.remove() else e.setValue(nv)
    }
  }

  def merge(other: MgBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(e.getKey, e.getValue)
    }
    prune()
  }
}

/** `freq_sketch(item, capacity)`: per group, the surviving
  * (item, estimate) counters sorted by (estimate desc, item asc).
  * Callers treat the items as CANDIDATES and recount exactly
  * ([[graft.ext.Corpus.heavyHitters]]) — the estimates alone undercount
  * by ≤ N/capacity.
  */
case class FreqSketch(child: Expression, capacity: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  require(capacity > 0, "capacity must be positive")

  override def prettyName: String = "freq_sketch"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString, 1L)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: MgBuffer): Any = {
    buf.prune()
    val entries = new Array[(String, Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    // prune first: the shipped partial honors the "≤ capacity counters
    // per partition" contract (the live map may sit at up to 2×capacity
    // between amortized prunes)
    buf.prune()
    // ONE entrySet pass pairing each key's bytes with ITS value — a
    // keySet pass zipped against a separate entrySet pass would lean on
    // HashMap view iteration order, which the spec does not promise
    val entries = new java.util.ArrayList[(Array[Byte], Long)](buf.counts.size)
    var size = 4
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries.add((b, e.getValue))
      size += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.size)
    var i = 0
    while (i < entries.size) {
      val (b, v) = entries.get(i)
      bb.putInt(b.length)
      bb.put(b)
      bb.putLong(v)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(capacity)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): FreqSketch =
    copy(child = newChild)
}
