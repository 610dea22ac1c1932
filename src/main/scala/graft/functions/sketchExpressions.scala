package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.hll.HllSketch
import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.CompactSketch
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Finish expressions: turn serialized sketch bytes (output of the *Agg
  * aggregates) into query results. These run once per aggregated group —
  * far off the hot path — so CodegenFallback is fine; the hot path (scan +
  * partial aggregation) stays inside whole-stage codegen.
  *
  * Equivalent surface to the reference's SummaryConverters
  * (/root/reference/core/src/main/java/com/whylogs/core/SummaryConverters.java).
  */
object SketchExprs {
  val boundsType: StructType = StructType(Seq(
    StructField("estimate", DoubleType),
    StructField("lower", DoubleType),
    StructField("upper", DoubleType)))

  val freqItemType: StructType = StructType(Seq(
    StructField("item", StringType),
    StructField("estimate", LongType),
    StructField("lower", LongType),
    StructField("upper", LongType)))

  val histBinType: StructType = StructType(Seq(
    StructField("lo", DoubleType),
    StructField("hi", DoubleType),
    StructField("count", LongType)))
}

/** Quantiles at the given ranks from KLL sketch bytes -> array<double>. */
case class KllQuantiles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType)
  override def prettyName: String = "kll_quantiles"
  // an EMPTY sketch yields null even when both inputs are non-nullable;
  // without this the planner assumes non-null and unboxes an NPE
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, ranks: Any): Any = {
    val sk = KllFloatsSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) return null
    val rs = ranks.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(
      sk.getQuantiles(rs, QuantileSearchCriteria.INCLUSIVE).map(_.toDouble))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Single quantile from KLL sketch bytes -> double. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  // an EMPTY sketch yields null even when both inputs are non-nullable;
  // without this the planner assumes non-null and unboxes an NPE
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, rank: Any): Any = {
    val sk = KllFloatsSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(rank.asInstanceOf[Double],
      QuantileSearchCriteria.INCLUSIVE).toDouble
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Row count observed by a KLL sketch. */
case class KllN(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"
  override def nullSafeEval(b: Any): Any =
    KllFloatsSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])).getN
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Equal-width histogram (numBins bins over [min,max]) from KLL bytes, via
  * the sketch PMF — reference semantics (SummaryConverters.java:161-222).
  */
case class KllHistogram(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(SketchExprs.histBinType)
  override def prettyName: String = "kll_histogram"
  // empty sketch -> null regardless of child nullability (see KllQuantile)
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, bins: Any): Any = {
    val sk = KllFloatsSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) return null
    val nBins = bins.asInstanceOf[Int]
    val mn = sk.getMinItem
    val mx = sk.getMaxItem
    val rows =
      if (!(mx > mn)) Array(InternalRow(mn.toDouble, mx.toDouble, sk.getN))
      else {
        val width = (mx - mn) / nBins.toFloat
        val splits = Array.tabulate(nBins - 1)(i => mn + width * (i + 1))
        val pmf = sk.getPMF(splits, QuantileSearchCriteria.INCLUSIVE)
        pmf.zipWithIndex.map { case (p, i) =>
          val lo = mn + width * i
          val hi = if (i == nBins - 1) mx else mn + width * (i + 1)
          InternalRow(lo.toDouble, hi.toDouble, math.round(p * sk.getN))
        }
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Histogram over CALLER-SUPPLIED split points from KLL bytes — the
  * reference's custom-splitpoint summary variant
  * (SummaryConverters.java:164-221: bin edges are [min] ++ splits ++
  * [max], counts are round(pmf_i * n)). Same INCLUSIVE rank convention
  * as [[KllHistogram]]. Splits must be strictly increasing; splits at or
  * outside the sketch min/max yield empty edge bins, matching the
  * reference (it forwards splits to getPMF unchanged).
  */
case class KllHistogramSplits(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(SketchExprs.histBinType)
  override def prettyName: String = "kll_histogram_splits"
  // empty sketch -> null regardless of child nullability (see KllQuantile)
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, splitsArr: Any): Any = {
    val sk = KllFloatsSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) return null
    val splits = splitsArr.asInstanceOf[ArrayData].toDoubleArray()
    require(splits.length >= 1, "at least 2 bins expected")
    require(splits.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "splitpoints must be strictly increasing")
    val pmf = sk.getPMF(splits.map(_.toFloat),
      QuantileSearchCriteria.INCLUSIVE)
    val edges = (sk.getMinItem.toDouble +: splits) :+ sk.getMaxItem.toDouble
    val rows = pmf.zipWithIndex.map { case (p, i) =>
      InternalRow(edges(i), edges(i + 1), math.round(p * sk.getN))
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** estimate/lower/upper (1 std dev) from theta sketch bytes. */
case class ThetaSummary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = SketchExprs.boundsType
  override def prettyName: String = "theta_summary"
  override def nullSafeEval(b: Any): Any = {
    val sk = CompactSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    InternalRow(sk.getEstimate, sk.getLowerBound(1), sk.getUpperBound(1))
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Distinct estimate from theta sketch bytes. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"
  override def nullSafeEval(b: Any): Any =
    CompactSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** estimate/lower/upper from HLL sketch bytes. */
case class HllSummary(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = SketchExprs.boundsType
  override def prettyName: String = "hll_summary"
  override def nullSafeEval(b: Any): Any = {
    val sk = HllSketch.heapify(b.asInstanceOf[Array[Byte]])
    InternalRow(sk.getEstimate, sk.getLowerBound(1), sk.getUpperBound(1))
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Distinct estimate from HLL sketch bytes. */
case class HllEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hll_estimate"
  override def nullSafeEval(b: Any): Any =
    HllSketch.heapify(b.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Heavy hitters from frequent-items sketch bytes ->
  * array<struct<item,estimate,lower,upper>>, descending by estimate.
  * NO_FALSE_NEGATIVES, as the reference summary (SummaryConverters.java:139-152).
  */
case class FreqItemsTopK(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(SketchExprs.freqItemType)
  override def prettyName: String = "freq_items_topk"

  override def nullSafeEval(sketchBytes: Any, k: Any): Any = {
    val sk = ItemsSketch.getInstance[String](
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe)
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .take(k.asInstanceOf[Int])
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Normalized rank of a value in KLL sketch bytes -> double in [0,1]:
  * fraction of the stream <= value (INCLUSIVE — exact below sketch
  * capacity).
  */
case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_rank"
  // empty sketch -> null regardless of child nullability (see KllQuantile)
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, value: Any): Any = {
    val sk = KllFloatsSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getRank(value.asInstanceOf[Double].toFloat,
      QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Theta set intersection of two sketch byte columns -> compact bytes. */
case class ThetaIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_intersect"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val i = org.apache.datasketches.theta.SetOperation.builder()
      .buildIntersection()
    i.intersect(CompactSketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    i.intersect(CompactSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    i.getResult.toByteArrayCompressed
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Theta set difference (A and not B) of two sketch byte columns. */
case class ThetaAnotB(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_a_not_b"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val op = org.apache.datasketches.theta.SetOperation.builder().buildANotB()
    op.aNotB(
        CompactSketch.heapify(Memory.wrap(a.asInstanceOf[Array[Byte]])),
        CompactSketch.heapify(Memory.wrap(b.asInstanceOf[Array[Byte]])))
      .toByteArrayCompressed
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
