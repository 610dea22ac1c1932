package graft.metrics

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.hll.{HllSketch, Union => HllUnion}
import org.apache.datasketches.memory.Memory

import graft.types.InferredType

/** Tunable knobs for a column profile. Defaults mirror the reference's
  * fixed parameters (/root/reference/core/src/main/java/com/whylogs/core/ColumnProfile.java:37-45,
  * /root/reference/core/src/main/java/com/whylogs/core/statistics/NumberTracker.java:38):
  * KLL k=256, HLL lgK=12, frequent-items maxMapSize=128, strings truncated
  * to 256 chars before cardinality/frequency tracking.
  */
case class ProfileConfig(
    kllK: Int = 256,
    hllLgK: Int = 12,
    freqItemsMapSize: Int = 128,
    stringLengthMax: Int = 256,
    withKll: Boolean = true,
    withTheta: Boolean = true,
    withHll: Boolean = true,
    withFreqItems: Boolean = true,
    withCharPos: Boolean = false,
    // classify string values into the numeric/boolean lattice (reference's
    // WHYLOGS_ENABLE_STRING_MATCHING) — off by default, like the reference.
    stringMatching: Boolean = false,
    // strings treated as NULL (reference's NULL_STRINGS env) — empty default.
    nullStrings: Set[String] = Set.empty)

object ProfileConfig {
  val default: ProfileConfig = ProfileConfig()
  def write(cfg: ProfileConfig, out: DataOutputStream): Unit = {
    out.writeInt(cfg.kllK); out.writeInt(cfg.hllLgK)
    out.writeInt(cfg.freqItemsMapSize); out.writeInt(cfg.stringLengthMax)
    out.writeBoolean(cfg.withKll); out.writeBoolean(cfg.withTheta)
    out.writeBoolean(cfg.withHll); out.writeBoolean(cfg.withFreqItems)
    out.writeBoolean(cfg.withCharPos); out.writeBoolean(cfg.stringMatching)
    out.writeInt(cfg.nullStrings.size)
    cfg.nullStrings.toSeq.sorted.foreach(out.writeUTF)
  }
  def read(in: DataInputStream): ProfileConfig = {
    val kllK = in.readInt(); val hllLgK = in.readInt()
    val fi = in.readInt(); val slm = in.readInt()
    val wk = in.readBoolean(); val wt = in.readBoolean()
    val wh = in.readBoolean(); val wf = in.readBoolean()
    val wc = in.readBoolean(); val sm = in.readBoolean()
    val n = in.readInt()
    val ns = (0 until n).map(_ => in.readUTF()).toSet
    ProfileConfig(kllK, hllLgK, fi, slm, wk, wt, wh, wf, wc, sm, ns)
  }
}

/** The complete per-column profile state: counters, type counts, numeric
  * tracker, string tracker, HLL cardinality over stringified values,
  * frequent-items sketch. A commutative monoid (zero/update/merge) — the
  * whole engine reduces to hash-aggregating this state.
  *
  * Null semantics (reference ColumnProfile.java:119-130): SQL NULL, NaN,
  * ±Inf, and configured null-strings all count as NULL.
  */
final class ColumnProfileState(val cfg: ProfileConfig, allocate: Boolean = true)
    extends Serializable {
  var count: Long = 0L // total rows seen, including nulls
  var trueCount: Long = 0L
  val schema = new SchemaCounts
  val numbers =
    new NumberState(cfg.kllK, allocate && cfg.withKll, allocate && cfg.withTheta)
  val strings =
    new StringState(allocate && cfg.withTheta, allocate && cfg.withCharPos)
  var hll: HllSketch =
    if (allocate && cfg.withHll) new HllSketch(cfg.hllLgK) else null
  var freq: ItemsSketch[String] =
    if (allocate && cfg.withFreqItems) new ItemsSketch[String](cfg.freqItemsMapSize)
    else null

  private def trackText(s: String): Unit = {
    val t = if (s.length > cfg.stringLengthMax) s.substring(0, cfg.stringLengthMax) else s
    if (hll != null) hll.update(t)
    if (freq != null) freq.update(t)
  }

  // ---- numeric stringify fast path (r17) -------------------------------
  // The update-path hot loop at 365M cells/pass (wide608) spends a large
  // share of its per-cell budget materializing String.valueOf(v) just to
  // feed the HLL/freq sketches (CellCost: "counts only" measured
  // 251 ns/cell with every sketch DISABLED — all stringify). SEMANTICS
  // ARE PINNED to stringified-value hashing (HLL estimates and frequent
  // items must be byte-identical to sketch.update(String.valueOf(v)) —
  // q11/q12 oracles and the wire format observe it; pinned by
  // NumericStringifySpec), so the fast path only (a) SKIPS the render
  // when no sketch consumes it and (b) replaces Double.toString
  // (~200 ns on JDK 17) for INTEGRAL doubles below 1e7 with a direct
  // "<digits>.0" byte render + one Latin-1 String — exactly the JDK's
  // output in that range. Fractional doubles keep Double.toString (a
  // shortest-repr re-implementation could not be trusted bit-for-bit),
  // and the sketches always receive a plain String: a variant feeding
  // the HLL through update(ByteBuffer) to skip the String was faster
  // single-threaded but SLOWER at local[32] — clean A/B with the fixed
  // narrow-shuffle guard and the update buffer in place measured
  // wide608 16.9 s (String) vs 20.2 s (ByteBuffer); the MurmurHash3
  // ByteBuffer route wraps a Memory segment per call, which the
  // 32-thread pass pays and the single-thread CellCost loop hides.
  @transient private var scratch: Array[Byte] = _

  /** Renders v's decimal digits (exactly Long.toString) into scratch
    * ending at index 22, returning the start index — so two trailing
    * bytes remain for the integral-double ".0" suffix.
    * Long.MinValue-safe (negative accumulation).
    */
  private def renderLong(v: Long): Int = {
    if (scratch == null) scratch = new Array[Byte](24)
    val b = scratch
    var n = if (v > 0) -v else v // negative domain holds MinValue
    var i = 22
    while (n <= -10) {
      i -= 1; b(i) = ('0' - (n % 10)).toByte; n /= 10
    }
    i -= 1; b(i) = ('0' - n).toByte
    if (v < 0) { i -= 1; b(i) = '-' }
    i
  }

  // ---- repeat-value memo (r17, GC + sketch-skip) ------------------------
  // Real tables are full of low-cardinality numeric columns (flags, small
  // enums, prices with few distinct cents) — in the wide-profile pass most
  // of the per-cell budget on those columns buys NOTHING new: the render
  // re-produces a String the state already hashed, and the HLL/theta
  // updates are byte-level no-ops on a duplicate (MemoizedUpdateSpec pins
  // datasketches idempotency: coupon dedup in LIST/SET, register max in
  // HLL mode, hash-table reject in theta — verified on compact AND
  // updatable images). A tiny direct-mapped cache keyed by (kind, raw
  // bits) therefore remembers the last rendered String per slot: a HIT
  // skips the render, the String/byte[] allocations, and the HLL + theta
  // updates, feeding only the per-occurrence consumers (freq counts,
  // KLL, moments, counters). A hit is only ever declared for a value this
  // state itself fully tracked (the memo is populated AFTER the sketch
  // updates), so the skip is provably byte-identical — high-cardinality
  // columns just miss (~3 ns probe) and take the old path. The memo is
  // @transient runtime state: deserialize/merge start cold (misses are
  // merely conservative — duplicate sketch updates are no-ops).
  private[graft] final val MemoSize = 128 // direct-mapped; 7-bit index
  @transient private var memoBits: Array[Long] = _
  @transient private var memoKind: Array[Byte] = _ // 0 = long, 1 = double
  @transient private var memoStr: Array[String] = _
  // test hook: forces every lookup to miss (old path) for parity specs
  private[graft] var memoDisabled: Boolean = false

  private def memoIdx(bits: Long): Int =
    (((bits * 0x9E3779B97F4A7C15L) >>> 57) & 127L).toInt

  private def memoHit(i: Int, kind: Byte, bits: Long): Boolean =
    !memoDisabled && memoStr != null && memoStr(i) != null &&
      memoKind(i) == kind && memoBits(i) == bits

  private def memoStore(i: Int, kind: Byte, bits: Long, s: String): Unit = {
    if (memoStr == null) {
      memoBits = new Array[Long](MemoSize)
      memoKind = new Array[Byte](MemoSize)
      memoStr = new Array[String](MemoSize)
    }
    memoBits(i) = bits; memoKind(i) = kind; memoStr(i) = s
  }

  def trackNull(): Unit = {
    count += 1
    schema.track(InferredType.Null)
  }

  def trackLong(v: Long): Unit = {
    count += 1
    schema.track(InferredType.Integral)
    if (hll != null || freq != null) {
      val i = memoIdx(v)
      if (memoHit(i, 0, v)) {
        if (freq != null) freq.update(memoStr(i))
        numbers.trackLongRepeat(v)
        return
      }
      // longs render to at most 20 chars, so truncation only applies
      // under a non-default stringLengthMax < 20 — matched to trackText
      // so the fast path's sketch inputs never diverge from string
      // tracking under ANY config (the branch is a hoisted comparison
      // on a plain field, free on the default 256)
      val s0 = String.valueOf(v)
      val s =
        if (s0.length > cfg.stringLengthMax) s0.substring(0, cfg.stringLengthMax)
        else s0
      if (hll != null) hll.update(s)
      if (freq != null) freq.update(s)
      numbers.trackLong(v)
      memoStore(i, 0, v, s)
    } else numbers.trackLong(v)
  }

  def trackDouble(v: Double): Unit = {
    count += 1
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) {
      schema.track(InferredType.Null)
    } else {
      schema.track(InferredType.Fractional)
      if (hll != null || freq != null) {
        val bits = java.lang.Double.doubleToRawLongBits(v)
        val i = memoIdx(bits)
        if (memoHit(i, 1, bits)) {
          if (freq != null) freq.update(memoStr(i))
          numbers.trackDoubleRepeat(v)
          return
        }
        // integral doubles below 1e7 render as "<digits>.0" — exactly
        // Double.toString's output in that range (scientific notation
        // starts at 1e7; -0.0 keeps its sign and is excluded)
        val s =
          if (v == Math.rint(v) && Math.abs(v) < 1e7 &&
              !(v == 0.0 && bits != 0L)) {
            val start = renderLong(v.toLong)
            scratch(22) = '.'
            scratch(23) = '0'
            new String(scratch, start, 24 - start,
              java.nio.charset.StandardCharsets.ISO_8859_1)
          } else String.valueOf(v)
        trackText(s)
        numbers.trackDouble(v)
        memoStore(i, 1, bits, s)
      } else numbers.trackDouble(v)
    }
  }

  // boolean twin of the memo: a column sees at most two boolean texts,
  // so after the first occurrence of each the HLL update is a proven
  // no-op (String.valueOf(boolean) returns the interned literal — the
  // render was already free; only the hash+coupon is skipped)
  @transient private var boolSeenTrue: Boolean = false
  @transient private var boolSeenFalse: Boolean = false

  def trackBoolean(v: Boolean): Unit = {
    count += 1
    schema.track(InferredType.Boolean)
    if (v) trueCount += 1
    if (!memoDisabled && (if (v) boolSeenTrue else boolSeenFalse)) {
      if (freq != null) freq.update(String.valueOf(v))
    } else {
      trackText(String.valueOf(v))
      if (v) boolSeenTrue = true else boolSeenFalse = true
    }
  }

  // string memo: direct-mapped by the String's own hash; only SHORT
  // strings (<= 64 chars) are memoized — low-cardinality columns are
  // flag/enum-shaped, and pinning 64 references to megabyte documents
  // per state would be a memory hazard for zero hit-rate. A hit skips
  // the HLL update and the string theta update (both byte-idempotent,
  // MemoizedUpdateSpec); freq counting and the exact length/token/
  // charpos stats still run per occurrence. <= 64 chars also means the
  // 256-char truncation never applies, so the memoized text IS the
  // tracked text.
  @transient private var smemo: Array[String] = _

  def trackString(s: String): Unit = {
    count += 1
    if (cfg.nullStrings.contains(s)) { schema.track(InferredType.Null); return }
    if (cfg.stringMatching) {
      InferredType.classifyString(s) match {
        case InferredType.Integral =>
          schema.track(InferredType.Integral)
          trackText(s); numbers.trackLong(s.replace(" ", "").toLong); return
        case InferredType.Fractional =>
          schema.track(InferredType.Fractional)
          trackText(s); numbers.trackDouble(s.replace(" ", "").toDouble); return
        case InferredType.Boolean =>
          schema.track(InferredType.Boolean)
          if (s.equalsIgnoreCase("true")) trueCount += 1
          trackText(s); return
        case _ => // fall through to plain string
      }
    }
    schema.track(InferredType.String)
    if (!memoDisabled && s.length <= 64 && (hll != null || freq != null)) {
      val i = s.hashCode & 63
      if (smemo == null) smemo = new Array[String](64)
      val c = smemo(i)
      if (c != null && c.equals(s)) {
        if (freq != null) freq.update(c)
        strings.updateRepeat(s)
      } else {
        trackText(s)
        strings.update(s)
        smemo(i) = s
      }
    } else {
      trackText(s)
      strings.update(s)
    }
  }

  // ---- numeric update BUFFER (r17, cache-locality) ---------------------
  // A wide profile interleaves updates across hundreds of column states
  // per input row; at 608 columns the per-thread working set (HLL table
  // + theta table + KLL levels + freq map per state) is tens of MB, so
  // EVERY cell update misses cache and the 32-thread pass ran ~4x the
  // single-thread CellCost floor. The aggregate's primitive fast path
  // therefore appends numeric cells to a tiny per-state buffer and
  // flushes 256 at a time through the exact trackLong/trackDouble
  // sequence — one column's sketch structures then stay hot in L2 for
  // 256 consecutive updates. ORDER IS PRESERVED per state (a buffer
  // only delays the same subsequence), so every sketch ingests the
  // identical value sequence and the result is BIT-IDENTICAL to the
  // unbuffered path (BufferedUpdateSpec). flush() runs before
  // serialize/merge/summary — the state is never observed half-applied
  // by the aggregate lifecycle; direct field readers outside it must
  // call flush() first (the aggregate and summarizer do).
  private[graft] final val BufCap = 512
  @transient private var pKinds: Array[Byte] = _ // 0 = long, 1 = double
  @transient private var pBits: Array[Long] = _
  @transient private var pN: Int = 0

  def bufferLong(v: Long): Unit = {
    if (pBits == null) {
      pKinds = new Array[Byte](BufCap); pBits = new Array[Long](BufCap)
    }
    pKinds(pN) = 0; pBits(pN) = v; pN += 1
    if (pN == BufCap) flush()
  }

  def bufferDouble(v: Double): Unit = {
    if (pBits == null) {
      pKinds = new Array[Byte](BufCap); pBits = new Array[Long](BufCap)
    }
    pKinds(pN) = 1
    pBits(pN) = java.lang.Double.doubleToRawLongBits(v)
    pN += 1
    if (pN == BufCap) flush()
  }

  def flush(): Unit = {
    var i = 0
    while (i < pN) {
      if (pKinds(i) == 0) trackLong(pBits(i))
      else trackDouble(java.lang.Double.longBitsToDouble(pBits(i)))
      i += 1
    }
    pN = 0
  }

  def merge(o: ColumnProfileState): Unit = {
    flush(); o.flush()
    count += o.count
    trueCount += o.trueCount
    schema.merge(o.schema)
    numbers.merge(o.numbers)
    strings.merge(o.strings)
    if (hll != null && o.hll != null) {
      val u = new HllUnion(math.max(cfg.hllLgK, o.cfg.hllLgK))
      u.update(hll); u.update(o.hll)
      hll = u.getResult(org.apache.datasketches.hll.TgtHllType.HLL_4)
    } else if (hll == null) hll = o.hll
    if (freq != null && o.freq != null) freq.merge(o.freq)
    else if (freq == null) freq = o.freq
  }

  def nullCount: Long = schema.get(InferredType.Null)

  def serialize(): Array[Byte] = {
    flush()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    ProfileConfig.write(cfg, out)
    out.writeLong(count); out.writeLong(trueCount)
    schema.write(out)
    numbers.write(out)
    strings.write(out)
    out.writeBoolean(hll != null)
    if (hll != null) Ser.writeBytes(out, hll.toCompactByteArray)
    out.writeBoolean(freq != null)
    if (freq != null) Ser.writeBytes(out, freq.toByteArray(new ArrayOfStringsSerDe))
    out.flush()
    bos.toByteArray
  }
}

object ColumnProfileState {
  def deserialize(bytes: Array[Byte]): ColumnProfileState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val cfg = ProfileConfig.read(in)
    // construct without allocating sketches; restore them from bytes
    val restored = new ColumnProfileState(cfg, allocate = false)
    restored.count = in.readLong()
    restored.trueCount = in.readLong()
    restored.schema.merge(SchemaCounts.read(in))
    restored.numbers.merge(NumberState.read(in))
    restored.strings.merge(StringState.read(in))
    if (in.readBoolean())
      restored.hll = HllSketch.heapify(Memory.wrap(Ser.readBytes(in)))
    if (in.readBoolean())
      restored.freq = ItemsSketch.getInstance[String](
        Memory.wrap(Ser.readBytes(in)), new ArrayOfStringsSerDe)
    restored
  }
}
