package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Bloom filter over 64-bit keys: the broadcastable set summary for
  * semi-join pruning when the exact key set outgrows the broadcast
  * threshold. `nBits` bits, `k` probes per key via Kirsch-Mitzenmacher
  * double hashing (two splitmix64-derived hashes; probe i checks bit
  * `(h1 + i·h2) mod nBits`) — index sequences are fully deterministic,
  * so two filters built from the same key SET are bit-identical
  * regardless of row order or partitioning (the merge is a bitwise OR).
  *
  * False-positive rate ≈ (1 - e^(-k·n/m))^k for n keys in m bits: 10
  * bits/key at k=5 gives under 1%. False negatives are impossible — a
  * Bloom prefilter followed by an exact join is therefore EXACT overall,
  * which is what keeps the bloom-accelerated queries oracle-checkable.
  */
object Bloom {

  /** splitmix64 finalizer — standard 64-bit avalanche mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Second hash: independent mix, forced odd so the probe stride never
    * degenerates (an even stride over a power-of-two-free modulus is
    * fine, but odd keeps the sequence full-period for any nBits). */
  def mix2(v: Long): Long = mix(v ^ 0x5bf03635f0935ad1L) | 1L

  def add(words: Array[Long], nBits: Int, k: Int, v: Long): Unit = {
    val h1 = mix(v); val h2 = mix2(v)
    var i = 0
    while (i < k) {
      val idx = (((h1 + i * h2) & Long.MaxValue) % nBits).toInt
      words(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
  }

  def contains(words: Array[Long], nBits: Int, k: Int, v: Long): Boolean = {
    val h1 = mix(v); val h2 = mix2(v)
    var i = 0
    while (i < k) {
      val idx = (((h1 + i * h2) & Long.MaxValue) % nBits).toInt
      if ((words(idx >>> 6) & (1L << (idx & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def nWords(nBits: Int): Int = (nBits + 63) >>> 6

  def toBytes(words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * words.length)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def toWords(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    words
  }
}

/** `bloom_agg(h, nBits, k)`: per group, the serialized Bloom filter of
  * all values of `h`. Mergeable (bitwise OR), constant-size (nBits/8
  * bytes), so the filter builds in ONE distributed aggregation with
  * map-side partials — the corpus-side analogue of [[KmvBottomK]].
  * The result is order- and partitioning-invariant bit-for-bit.
  */
case class BloomAgg(child: Expression, nBits: Int, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(nBits >= 64, "nBits must be at least 64")
  require(k > 0 && k <= 16, "k probes must be in 1..16")

  override def prettyName: String = "bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Bloom.nWords(nBits))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buf, nBits, k, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = Bloom.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = Bloom.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Bloom.toWords(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** Shared codegen for the probe loop: both probe expressions inline the
  * same k-lookup loop; only where the word array comes from differs.
  */
private[functions] object BloomCodegen {
  def probeLoop(ctx: CodegenContext, ev: ExprCode, wordsVar: String,
                a: String, nBits: Int, k: Int): String = {
    val h1 = ctx.freshName("h1"); val h2 = ctx.freshName("h2")
    val i = ctx.freshName("i"); val idx = ctx.freshName("idx")
    val hit = ctx.freshName("hit")
    s"""
      long $h1 = graft.functions.Bloom.mix($a);
      long $h2 = graft.functions.Bloom.mix2($a);
      boolean $hit = true;
      for (int $i = 0; $i < $k; $i++) {
        int $idx = (int) ((($h1 + $i * $h2) & Long.MAX_VALUE) % ${nBits}L);
        if (($wordsVar[$idx >>> 6] & (1L << ($idx & 63))) == 0L) {
          $hit = false; break;
        }
      }
      ${ev.value} = $hit;
    """
  }
}

/** `bloom_contains(h, filter, nBits, k)`: membership probe against a
  * prebuilt filter. The filter arrives as a foldable binary literal and
  * is carried as ONE reference object (shared by every codegen'd task,
  * like the IVF centroid matrix) — the plan stays O(1) in the filter
  * size, and whole-stage codegen inlines the probe loop, so the
  * prefilter runs inside the scan's codegen stage with no shuffle.
  *
  * SIZE LIMIT: the reference object serializes into every task binary,
  * so this form is for filters up to ~16 MB.
  * [[graft.ext.Corpus.decontaminateBloom]] dispatches on
  * [[graft.ext.Corpus.BloomBroadcastBytes]]: filters above the switch
  * ride a proper torrent broadcast instead — [[BloomContainsBcast]] —
  * because with a task-binary literal the driver re-serializes the full
  * array per stage and every task deserializes its own copy (10⁹
  * benchmark shingles at 10 bits/key ≈ 1.25 GB per task binary).
  */
case class BloomContains(child: Expression, words: Array[Long],
                         nBits: Int, k: Int) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def nullSafeEval(a: Any): Any =
    Bloom.contains(words, nBits, k, a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      BloomCodegen.probeLoop(ctx, ev, wordsRef, a, nBits, k))
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

/** [[BloomContains]] with the word array riding an explicit
  * `Broadcast[Array[Long]]` instead of the task binary — the GB-scale
  * form: the array ships once per executor via the torrent broadcast
  * (executors serve chunks to each other; the driver uploads once) and
  * is dereferenced ONCE per task instance into a local `long[]`, so the
  * probe loop itself is the same codegen as the literal form. Results
  * are identical by construction (same mix/probe sequence over the same
  * words).
  */
case class BloomContainsBcast(child: Expression,
    bcast: org.apache.spark.broadcast.Broadcast[Array[Long]],
    nBits: Int, k: Int) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains_bcast"

  @transient private lazy val words: Array[Long] = bcast.value

  override def nullSafeEval(a: Any): Any =
    Bloom.contains(words, nBits, k, a.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bloomBcast", bcast,
      "org.apache.spark.broadcast.Broadcast")
    // dereference once per task instance (generated-class init), not per row
    val wordsVar = ctx.addMutableState("long[]", "bloomBcastWords",
      v => s"$v = (long[]) $bRef.value();")
    nullSafeCodeGen(ctx, ev, a =>
      BloomCodegen.probeLoop(ctx, ev, wordsVar, a, nBits, k))
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsBcast =
    copy(child = newChild)
}

/** Driver-side handle registry that lets a live broadcast cross the
  * temp-function boundary: [[VectorFunctions]] builders only receive
  * foldable literals, so callers register the broadcast, pass the
  * returned id as a literal, and the builder — which runs on the driver
  * during analysis — resolves the handle back to the object.
  *
  * LIFECYCLE: `put` → build the column → construct the consuming
  * Dataset (Dataset creation eagerly analyzes, which resolves the
  * handle and embeds the `Broadcast` object in the plan) → `remove`.
  * A retained entry is a strong reference that defeats the
  * `ContextCleaner`'s weak-reference broadcast cleanup — a GB-scale
  * filter would stay pinned for the JVM lifetime — so callers MUST
  * remove the handle once the plan holds the broadcast
  * ([[graft.ext.Corpus.decontaminateBloom]] does).
  */
object BloomBroadcasts {
  private val reg = new java.util.concurrent.ConcurrentHashMap[
    Long, org.apache.spark.broadcast.Broadcast[Array[Long]]]()
  private val ids = new java.util.concurrent.atomic.AtomicLong(0L)

  def put(b: org.apache.spark.broadcast.Broadcast[Array[Long]]): Long = {
    val id = ids.incrementAndGet(); reg.put(id, b); id
  }
  def get(id: Long): org.apache.spark.broadcast.Broadcast[Array[Long]] = {
    val b = reg.get(id)
    require(b != null, s"no registered bloom broadcast with id $id " +
      "(register via BloomBroadcasts.put before building the column)")
    b
  }
  /** Drop the handle so the broadcast's lifetime is the plan's, not the
    * JVM's. Idempotent. */
  def remove(id: Long): Unit = reg.remove(id)
  /** Registry population — spec hook for leak assertions. */
  private[graft] def size: Int = reg.size
}
