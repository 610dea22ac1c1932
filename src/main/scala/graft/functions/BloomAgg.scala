package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Mutable Bloom filter buffer: a flat long[] bit array plus the hash
  * count. Keys are caller-side 64-bit hashes (pass `xxhash64(col)`), so
  * the aggregate is type-agnostic and the k probe positions derive from
  * one splitmix64 re-mix — no per-key string hashing inside the buffer.
  */
final class BloomBuffer(val numBits: Long, val numHashFns: Int) {
  require(numBits >= 64 && numBits <= BloomRuntime.MaxBits &&
    (numBits & 63) == 0,
    s"numBits must be a multiple of 64 in [64, 2^33], got $numBits")
  require(numHashFns >= 1 && numHashFns <= 16,
    s"numHashFns must be in [1,16], got $numHashFns")
  val words = new Array[Long]((numBits >> 6).toInt)

  def put(h: Long): Unit = {
    val h2 = BloomRuntime.splitmix64(h)
    var i = 0
    while (i < numHashFns) {
      val bit = java.lang.Long.remainderUnsigned(h + i.toLong * h2, numBits)
      words((bit >> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  def or(other: BloomBuffer): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }

  /** Wire form: magic, k, numBits, content checksum, words. The checksum
    * lets [[BloomMightContain]] key its per-thread deserialization cache
    * on O(1) header bytes instead of hashing the whole bit array per row.
    */
  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(24 + 8 * words.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(BloomRuntime.Magic)
    bb.putInt(numHashFns)
    bb.putLong(numBits)
    var sum = 0x6A09E667F3BCC909L
    var i = 0
    while (i < words.length) {
      sum = BloomRuntime.splitmix64(sum ^ words(i)); i += 1
    }
    bb.putLong(sum)
    i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }
}

/** Static runtime for Bloom bytes: deserialization with a per-thread
  * single-entry cache (the filter column is constant across the scanned
  * rows in the decontamination plans, so the cache hits on every row
  * after the first) and the membership probe called from both the
  * interpreted and generated code paths.
  */
object BloomRuntime {
  val Magic: Int = 0x424C4D31 // "BLM1"

  /** 2^33 bits = 1 GiB of words — the ceiling where the serialized form
    * (24 + 8 * words.length bytes) still fits Int-addressed buffers.
    * Anything bigger would overflow ByteBuffer.allocate / the words
    * array INSIDE A TASK; the driver-side require keeps the
    * fail-at-plan-construction contract honest.
    */
  val MaxBits: Long = 1L << 33

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  // (checksum, numBits, k, words) of the last filter seen by this thread,
  // held through a SoftReference: executor task threads are pooled and
  // outlive the job, so a hard ThreadLocal would pin one full copy of the
  // word array (up to 1 GiB at MaxBits) per pooled thread for the JVM's
  // lifetime after a big decontamination job. Soft refs let the GC drop
  // idle copies under memory pressure; a re-probe just re-deserializes.
  // (BloomMightContainBroadcast remains the right tool for megabyte+
  // filters — one parsed copy per executor, not per thread.)
  private val cache =
    new ThreadLocal[java.lang.ref.SoftReference[(Long, Long, Int, Array[Long])]]

  def mightContain(bytes: Array[Byte], h: Long): Boolean = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(0) == Magic, "not graft bloom filter bytes")
    val k = bb.getInt(4)
    val numBits = bb.getLong(8)
    val checksum = bb.getLong(16)
    val ref = cache.get()
    var entry = if (ref == null) null else ref.get()
    if (entry == null || entry._1 != checksum || entry._2 != numBits ||
      entry._3 != k) {
      val words = new Array[Long]((numBits >> 6).toInt)
      var i = 0
      while (i < words.length) { words(i) = bb.getLong(24 + 8 * i); i += 1 }
      entry = (checksum, numBits, k, words)
      cache.set(new java.lang.ref.SoftReference(entry))
    }
    val words = entry._4
    val h2 = splitmix64(h)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h + i.toLong * h2, numBits)
      if ((words((bit >> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def deserialize(bytes: Array[Byte], expectBits: Long, expectK: Int): BloomBuffer = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(0) == Magic, "not graft bloom filter bytes")
    val k = bb.getInt(4)
    val numBits = bb.getLong(8)
    require(numBits == expectBits && k == expectK,
      s"bloom shape mismatch: stored ($numBits bits, $k hashes), " +
        s"aggregate declared ($expectBits, $expectK)")
    val buf = new BloomBuffer(numBits, k)
    var i = 0
    while (i < buf.words.length) { buf.words(i) = bb.getLong(24 + 8 * i); i += 1 }
    buf
  }
}

/** Bloom membership filter aggregate over PRE-HASHED keys -> filter bytes.
  * Callers hash with `xxhash64(key)` so one aggregate covers every input
  * type, and the k probe positions are derived in-buffer (double hashing:
  * h + i*splitmix64(h)), keeping the update a handful of ALU ops per row.
  *
  * Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k; the 2^23-bit default
  * holds ~600k keys at <1% FP in 1 MB. State is O(numBits) regardless of
  * input size — the merge is a word-wise OR, so the shuffle carries one
  * fixed-size buffer per partition, never the key stream.
  */
case class BloomAgg(
    child: Expression,
    numBits: Long = 1L << 23,
    numHashFns: Int = 5,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomBuffer] {

  // fail at plan construction on the driver, not in a task on the
  // executors (BloomBuffer re-checks, but that surfaces as an opaque
  // task failure)
  require(numBits >= 64 && numBits <= BloomRuntime.MaxBits &&
    (numBits & 63) == 0,
    s"numBits must be a multiple of 64 in [64, 2^33], got $numBits")
  require(numHashFns >= 1 && numHashFns <= 16,
    s"numHashFns must be in [1,16], got $numHashFns")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_agg takes a 64-bit hash (use xxhash64(col)), got $other")
    }

  override def createAggregationBuffer(): BloomBuffer =
    new BloomBuffer(numBits, numHashFns)

  override def update(buf: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) buf.put(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomBuffer, b: BloomBuffer): BloomBuffer = {
    a.or(b); a
  }

  override def eval(buf: BloomBuffer): Any = buf.serialize()
  override def serialize(buf: BloomBuffer): Array[Byte] = buf.serialize()
  override def deserialize(b: Array[Byte]): BloomBuffer =
    BloomRuntime.deserialize(b, numBits, numHashFns)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** `might_contain(bloom_bytes, xxhash64(key))` — true if the key MAY be in
  * the set (no false negatives; false positives at the filter's design
  * rate). Codegen-friendly: the generated code is one static call into
  * [[BloomRuntime]], whose per-thread cache makes the per-row cost k word
  * probes — the hot decontamination scan stays inside whole-stage codegen.
  *
  * SCALE CAVEAT: when the bloom bytes arrive as a JOINED COLUMN (the
  * 1-row cross-join attachment), every row's evaluation first COPIES the
  * full byte array out of the row (`UnsafeRow.getBinary`) before the
  * cache can hit — an O(numBits) memcpy per row that dwarfs the probe
  * itself for megabyte filters. Row-stream plans should use
  * [[BloomMightContainBroadcast]], which ships the filter once per
  * executor; this column form is for SQL callers and small filters.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (binary, bigint), got $other")
    }

  override def nullSafeEval(bloom: Any, hash: Any): Any =
    BloomRuntime.mightContain(bloom.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomRuntime.mightContain($b, $h)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** [[BloomMightContain]] with the filter as a torrent-broadcast handle
  * (the [[TopCentroidsBroadcast]] pattern): the bytes ship once per
  * executor and parse once per expression instance — per-row work is
  * exactly k word probes, no per-row byte copies, no join in the plan.
  * This is the form [[graft.ops.Dedup.bloomSemiJoin]] uses on the corpus
  * scan.
  */
case class BloomMightContainBroadcast(
    bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a bigint hash, got $other")
    }

  @transient private lazy val parsed: (Int, Long, Array[Long]) = {
    val bytes = bloom.value
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt(0) == BloomRuntime.Magic,
      "not graft bloom filter bytes")
    val k = bb.getInt(4)
    val numBits = bb.getLong(8)
    val words = new Array[Long]((numBits >> 6).toInt)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(24 + 8 * i); i += 1 }
    (k, numBits, words)
  }

  def probe(h: Long): Boolean = {
    val (k, numBits, words) = parsed
    val h2 = BloomRuntime.splitmix64(h)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h + i.toLong * h2, numBits)
      if ((words((bit >> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override def nullSafeEval(hash: Any): Any = probe(hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContainBroadcast].getName)
    defineCodeGen(ctx, ev, h => s"$ref.probe($h)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
