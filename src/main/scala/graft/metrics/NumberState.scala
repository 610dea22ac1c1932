package graft.metrics

import java.io.{DataInputStream, DataOutputStream}

import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}

private[graft] object Ser {
  def writeBytes(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length); out.write(b)
  }
  def readBytes(in: DataInputStream): Array[Byte] = {
    val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b); b
  }
}

/** Full numeric tracker: exact long stats, exact double stats, Welford
  * variance, KLL(k) quantile sketch over `(float)value`, Theta distinct
  * sketch.
  *
  * Long/double split semantics follow the reference's NumberTracker
  * (/root/reference/core/src/main/java/com/whylogs/core/statistics/NumberTracker.java:38-56):
  * integral values accumulate in the exact long tracker until the first
  * fractional value arrives, at which point long state is absorbed into the
  * double tracker. Unlike the reference, merge also normalizes: if either
  * side has double state, long state is absorbed — making the merged view
  * independent of partition order.
  */
final class NumberState(val kllK: Int, val withKll: Boolean, val withTheta: Boolean)
    extends Serializable {

  var longCount: Long = 0L
  var longMin: Long = Long.MaxValue
  var longMax: Long = Long.MinValue
  var longSum: Long = 0L

  val doubles = new Moments // only used once fractional values appear
  val variance = new Moments // over all numeric values, as double

  var kll: KllFloatsSketch =
    if (withKll) KllFloatsSketch.newHeapInstance(kllK) else null
  var theta: Union =
    if (withTheta) SetOperation.builder().buildUnion() else null

  def trackLong(v: Long): Unit = trackLongImpl(v, updateTheta = true)

  /** Repeat-value fast path (r17 memo cache): the caller PROVES this exact
    * value was already tracked by this state, so the theta update — a
    * byte-level no-op on a duplicate (MemoizedUpdateSpec pins Union
    * idempotency) — is skipped. Everything per-occurrence (counters,
    * moments, KLL) still runs.
    */
  def trackLongRepeat(v: Long): Unit = trackLongImpl(v, updateTheta = false)

  private def trackLongImpl(v: Long, updateTheta: Boolean): Unit = {
    variance.update(v.toDouble)
    if (kll != null) kll.update(v.toFloat)
    if (updateTheta && theta != null) theta.update(v.toDouble)
    if (doubles.count > 0) doubles.update(v.toDouble)
    else {
      longCount += 1
      if (v < longMin) longMin = v
      if (v > longMax) longMax = v
      longSum += v
    }
  }

  def trackDouble(v: Double): Unit = trackDoubleImpl(v, updateTheta = true)

  /** See [[trackLongRepeat]]. */
  def trackDoubleRepeat(v: Double): Unit = trackDoubleImpl(v, updateTheta = false)

  private def trackDoubleImpl(v: Double, updateTheta: Boolean): Unit = {
    variance.update(v)
    if (kll != null) kll.update(v.toFloat)
    if (updateTheta && theta != null) theta.update(v)
    if (doubles.count == 0 && longCount > 0) absorbLongs()
    doubles.update(v)
  }

  private def absorbLongs(): Unit = {
    if (longCount == 0) return
    val m = new Moments
    m.count = longCount
    m.min = longMin.toDouble
    m.max = longMax.toDouble
    m.sum = longSum.toDouble
    // mean/m2 of the absorbed longs are not recoverable exactly; the
    // variance tracker above already covers all values, so doubles.mean/m2
    // are maintained only for the double-typed subset. Keep sum-consistent:
    m.mean = if (longCount > 0) longSum.toDouble / longCount else 0.0
    m.m2 = 0.0
    doubles.merge(m)
    longCount = 0; longMin = Long.MaxValue; longMax = Long.MinValue; longSum = 0L
  }

  def merge(o: NumberState): Unit = {
    variance.merge(o.variance)
    if (kll != null && o.kll != null) kll.merge(o.kll)
    else if (kll == null) kll = o.kll
    if (theta != null && o.theta != null) theta.union(o.theta.getResult)
    else if (theta == null) theta = o.theta
    // exact trackers
    doubles.merge(o.doubles)
    longCount += o.longCount
    if (o.longMin < longMin) longMin = o.longMin
    if (o.longMax > longMax) longMax = o.longMax
    longSum += o.longSum
    if (doubles.count > 0) absorbLongs()
  }

  /** total numeric values tracked */
  def count: Long = variance.count
  def isIntegral: Boolean = doubles.count == 0 && longCount > 0

  def finalMin: Double =
    if (doubles.count > 0) doubles.min
    else if (longCount > 0) longMin.toDouble
    else Double.NaN
  def finalMax: Double =
    if (doubles.count > 0) doubles.max
    else if (longCount > 0) longMax.toDouble
    else Double.NaN
  def finalSum: Double =
    if (doubles.count > 0) doubles.sum else longSum.toDouble

  def write(out: DataOutputStream): Unit = {
    out.writeInt(kllK)
    out.writeBoolean(kll != null)
    out.writeBoolean(theta != null)
    out.writeLong(longCount); out.writeLong(longMin)
    out.writeLong(longMax); out.writeLong(longSum)
    doubles.write(out); variance.write(out)
    if (kll != null) Ser.writeBytes(out, kll.toByteArray)
    if (theta != null)
      Ser.writeBytes(out, theta.getResult.toByteArrayCompressed)
  }
}

object NumberState {
  def read(in: DataInputStream): NumberState = {
    val k = in.readInt()
    val hasKll = in.readBoolean()
    val hasTheta = in.readBoolean()
    val s = new NumberState(k, withKll = false, withTheta = false)
    s.longCount = in.readLong(); s.longMin = in.readLong()
    s.longMax = in.readLong(); s.longSum = in.readLong()
    val d = Moments.read(in); s.doubles.merge(d)
    // direct field copy for exactness (merge on empty is a copy anyway)
    val v = Moments.read(in); s.variance.merge(v)
    if (hasKll)
      s.kll = KllFloatsSketch.heapify(Memory.wrap(Ser.readBytes(in)))
    if (hasTheta) {
      val u = SetOperation.builder().buildUnion()
      u.union(org.apache.datasketches.theta.CompactSketch.heapify(
        Memory.wrap(Ser.readBytes(in))))
      s.theta = u
    }
    s
  }
}
