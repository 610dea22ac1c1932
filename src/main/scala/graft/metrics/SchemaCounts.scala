package graft.metrics

import java.io.{DataInputStream, DataOutputStream}

import graft.types.InferredType

/** Per-type occurrence counters + type-inference rules.
  *
  * Inference semantics mirror the reference
  * (/root/reference/core/src/main/java/com/whylogs/core/statistics/SchemaTracker.java:41-105):
  *  1. most popular type wins outright at ratio > 0.7;
  *  2. STRING absorbs all non-UNKNOWN types when it beats the combined
  *     numeric count;
  *  3. plain majority > 0.5 wins (FRACTIONAL absorbs INTEGRAL in its count);
  *  4. INTEGRAL+FRACTIONAL combined majority > 0.5 coerces to FRACTIONAL;
  *  5. otherwise UNKNOWN.
  */
final class SchemaCounts extends Serializable {
  // indexed by InferredType id (0..5)
  val counts: Array[Long] = new Array[Long](6)

  def track(t: InferredType.InferredType): Unit = counts(t.id) += 1
  def get(t: InferredType.InferredType): Long = counts(t.id)

  def merge(other: SchemaCounts): Unit = {
    var i = 0
    while (i < 6) { counts(i) += other.counts(i); i += 1 }
  }

  def total: Long = counts.sum

  /** (inferredType, ratio) per the rules above. */
  def inferType: (InferredType.InferredType, Double) = {
    val totalCount = total
    if (totalCount == 0) return (InferredType.Unknown, 0.0)

    // most popular type (deterministic tie-break: lowest ordinal)
    var bestId = 0
    var i = 1
    while (i < 6) { if (counts(i) > counts(bestId)) bestId = i; i += 1 }
    val best = InferredType(bestId)
    val bestRatio = counts(bestId).toDouble / totalCount
    if (bestRatio > 0.7) return (best, bestRatio)

    val fractionalCount =
      counts(InferredType.Integral.id) + counts(InferredType.Fractional.id)

    if (best == InferredType.String &&
        counts(InferredType.String.id) > fractionalCount) {
      val coerced = counts(InferredType.String.id) + fractionalCount +
        counts(InferredType.Boolean.id)
      return (InferredType.String, coerced.toDouble / totalCount)
    }

    if (bestRatio > 0.5) {
      val actual =
        if (best == InferredType.Fractional) fractionalCount else counts(bestId)
      return (best, actual.toDouble / totalCount)
    }

    val fracRatio = fractionalCount.toDouble / totalCount
    if (fracRatio > 0.5) return (InferredType.Fractional, fracRatio)

    (InferredType.Unknown, 1.0)
  }

  def write(out: DataOutputStream): Unit = {
    var i = 0
    while (i < 6) { out.writeLong(counts(i)); i += 1 }
  }
}

object SchemaCounts {
  def read(in: DataInputStream): SchemaCounts = {
    val s = new SchemaCounts
    var i = 0
    while (i < 6) { s.counts(i) = in.readLong(); i += 1 }
    s
  }
}
