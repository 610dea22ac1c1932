package graft.metrics

import java.io.{DataInputStream, DataOutputStream}

/** Exact streaming moments: count/min/max/sum plus Welford mean/M2.
  *
  * Update is Welford's online algorithm; merge is the parallel variant
  * (Chan et al.) — the same algebra Spark's own CentralMomentAgg uses, and
  * the same semantics as the reference's VarianceTracker
  * (/root/reference/core/src/main/java/com/whylogs/core/statistics/datatypes/VarianceTracker.java:21-69).
  */
final class Moments extends Serializable {
  var count: Long = 0L
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity
  var sum: Double = 0.0
  var mean: Double = 0.0
  var m2: Double = 0.0

  def update(x: Double): Unit = {
    count += 1
    if (x < min) min = x
    if (x > max) max = x
    sum += x
    val d = x - mean
    mean += d / count
    m2 += d * (x - mean)
  }

  def merge(o: Moments): Unit = {
    if (o.count == 0) return
    if (count == 0) {
      count = o.count; min = o.min; max = o.max; sum = o.sum
      mean = o.mean; m2 = o.m2
      return
    }
    val n = count + o.count
    val delta = o.mean - mean
    m2 += o.m2 + delta * delta * count * o.count / n
    mean = (count * mean + o.count * o.mean) / n
    count = n
    if (o.min < min) min = o.min
    if (o.max > max) max = o.max
    sum += o.sum
  }

  def variance: Double = if (count < 2) Double.NaN else m2 / (count - 1)
  def stddev: Double = math.sqrt(variance)

  def write(out: DataOutputStream): Unit = {
    out.writeLong(count); out.writeDouble(min); out.writeDouble(max)
    out.writeDouble(sum); out.writeDouble(mean); out.writeDouble(m2)
  }
}

object Moments {
  def read(in: DataInputStream): Moments = {
    val m = new Moments
    m.count = in.readLong(); m.min = in.readDouble(); m.max = in.readDouble()
    m.sum = in.readDouble(); m.mean = in.readDouble(); m.m2 = in.readDouble()
    m
  }
}
