package graft.profile

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ErrorType
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.metrics.{ColumnProfileState, Moments}

/** The queryable column-profile struct: the engine's equivalent of the
  * reference's ColumnSummary (/root/reference/core/src/main/java/com/whylogs/core/SummaryConverters.java:75-160),
  * held as a typed Spark struct (plain SQL can query every metric) instead of
  * an opaque protobuf. `state` carries the full serialized monoid state so
  * profiles can be re-aggregated later (merge = deserialize + monoid merge).
  */
object ProfileSchema {

  /** Quantile grid, as the reference (SummaryConverters.java:110-124). */
  val QuantileGrid: Array[Double] =
    Array(0.0, 0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99, 1.0)

  val HistogramBins = 30

  val momentsType: StructType = StructType(Seq(
    StructField("count", LongType, nullable = false),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("sum", DoubleType),
    StructField("mean", DoubleType),
    StructField("variance", DoubleType),
    StructField("stddev", DoubleType)))

  val uniqueType: StructType = StructType(Seq(
    StructField("estimate", DoubleType),
    StructField("lower", DoubleType),
    StructField("upper", DoubleType)))

  val numbersType: StructType = StructType(Seq(
    StructField("count", LongType, nullable = false),
    StructField("min", DoubleType),
    StructField("max", DoubleType),
    StructField("sum", DoubleType),
    StructField("mean", DoubleType),
    StructField("variance", DoubleType),
    StructField("stddev", DoubleType),
    StructField("is_integral", BooleanType, nullable = false),
    StructField("long_min", LongType),
    StructField("long_max", LongType),
    StructField("long_sum", LongType),
    StructField("unique", uniqueType),
    StructField("quantiles", ArrayType(DoubleType)),
    StructField("histogram", ArrayType(StructType(Seq(
      StructField("lo", DoubleType),
      StructField("hi", DoubleType),
      StructField("count", LongType))))),
    StructField("kll", BinaryType),
    StructField("theta", BinaryType)))

  val stringsType: StructType = StructType(Seq(
    StructField("count", LongType, nullable = false),
    StructField("unique", uniqueType),
    StructField("length", momentsType),
    StructField("token_length", momentsType),
    StructField("char_pos", MapType(StringType, momentsType)),
    // emitted only when the distinct estimate is < 100, the reference's
    // NO_FALSE_NEGATIVES gate (SummaryConverters.java:55-60)
    StructField("frequent", ArrayType(StructType(Seq(
      StructField("value", StringType),
      StructField("estimate", LongType))))),
    StructField("theta", BinaryType)))

  val typeCountsType: StructType = StructType(Seq(
    StructField("null", LongType, nullable = false),
    StructField("fractional", LongType, nullable = false),
    StructField("integral", LongType, nullable = false),
    StructField("boolean", LongType, nullable = false),
    StructField("string", LongType, nullable = false),
    StructField("unknown", LongType, nullable = false)))

  val frequentItemType: StructType = StructType(Seq(
    StructField("item", StringType),
    StructField("estimate", LongType),
    StructField("lower", LongType),
    StructField("upper", LongType)))

  val schema: StructType = StructType(Seq(
    StructField("count", LongType, nullable = false),
    StructField("null_count", LongType, nullable = false),
    StructField("true_count", LongType, nullable = false),
    StructField("inferred_type", StringType),
    StructField("type_ratio", DoubleType),
    StructField("type_counts", typeCountsType),
    StructField("numbers", numbersType),
    StructField("strings", stringsType),
    StructField("cardinality", StructType(Seq(
      StructField("estimate", DoubleType),
      StructField("lower", DoubleType),
      StructField("upper", DoubleType),
      StructField("hll", BinaryType)))),
    StructField("frequent_items", ArrayType(frequentItemType)),
    StructField("state", BinaryType)))

  /** Nullability-normalized type equality: parquet round-trips relax
    * nullable flags, but the struct shape still identifies a profile column.
    */
  private def normalize(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, normalize(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(normalize(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(normalize(m.keyType), normalize(m.valueType),
        valueContainsNull = true)
    case other => other
  }

  private lazy val normalizedSchema = normalize(schema)

  def isProfileType(dt: DataType): Boolean = normalize(dt) == normalizedSchema

  private def momentsRow(m: Moments): Row =
    if (m.count == 0) Row(0L, null, null, null, null, null, null)
    else Row(m.count, m.min, m.max, m.sum, m.mean,
      if (m.count < 2) null else m.variance,
      if (m.count < 2) null else m.stddev)

  /** state -> external Row matching [[schema]]. */
  def summarize(st: ColumnProfileState): Row = {
    val (inferred, ratio) = st.schema.inferType
    val tc = st.schema.counts
    val typeCounts = Row(tc(1), tc(2), tc(3), tc(4), tc(5), tc(0))

    // numbers
    val n = st.numbers
    val numbers = {
      val cnt = n.count
      val unique =
        if (n.theta == null) null
        else {
          val sk = n.theta.getResult
          Row(sk.getEstimate, sk.getLowerBound(1), sk.getUpperBound(1))
        }
      val (quantiles, histogram) =
        if (n.kll == null || n.kll.isEmpty) (null, null)
        else {
          val qs = n.kll
            .getQuantiles(QuantileGrid, QuantileSearchCriteria.INCLUSIVE)
            .map(_.toDouble).toSeq
          val mn = n.kll.getMinItem
          val mx = n.kll.getMaxItem
          val hist =
            if (!(mx > mn)) Seq(Row(mn.toDouble, mx.toDouble, n.kll.getN))
            else {
              // equal-width split points, kept strictly increasing: at large
              // magnitudes the float width can round below one ulp and
              // produce duplicate splits, which getPMF rejects — drop them
              // (the affected bins merge into their neighbor)
              val width = (mx - mn) / HistogramBins.toFloat
              val splits = {
                val buf = scala.collection.mutable.ArrayBuffer.empty[Float]
                var prev = mn
                var i = 1
                while (i < HistogramBins) {
                  val s = mn + width * i
                  if (s > prev && s < mx) { buf += s; prev = s }
                  i += 1
                }
                buf.toArray
              }
              val total = n.kll.getN
              if (splits.isEmpty) Seq(Row(mn.toDouble, mx.toDouble, total))
              else {
                val pmf = n.kll.getPMF(splits, QuantileSearchCriteria.INCLUSIVE)
                val bounds = mn +: splits :+ mx
                pmf.toIndexedSeq.zipWithIndex.map { case (p, i) =>
                  Row(bounds(i).toDouble, bounds(i + 1).toDouble,
                    math.round(p * total))
                }
              }
            }
          (qs, hist)
        }
      if (cnt == 0 && unique == null && quantiles == null) null
      else Row(
        cnt,
        if (cnt == 0) null else n.finalMin,
        if (cnt == 0) null else n.finalMax,
        if (cnt == 0) null else n.finalSum,
        if (cnt == 0) null else n.variance.mean,
        if (cnt < 2) null else n.variance.variance,
        if (cnt < 2) null else n.variance.stddev,
        n.isIntegral,
        if (n.longCount > 0) n.longMin else null,
        if (n.longCount > 0) n.longMax else null,
        if (n.longCount > 0) n.longSum else null,
        unique, quantiles, histogram,
        if (n.kll == null) null else n.kll.toByteArray,
        if (n.theta == null) null else n.theta.getResult.toByteArrayCompressed)
    }

    // strings
    val s = st.strings
    val strings =
      if (s.count == 0) null
      else {
        val unique =
          if (s.theta == null) null
          else {
            val sk = s.theta.getResult
            Row(sk.getEstimate, sk.getLowerBound(1), sk.getUpperBound(1))
          }
        val charPos =
          if (s.charPos == null) null
          else s.charPos.perChar.map { case (c, m) =>
            (if (c == '\u0000') "NITL" else c.toString) -> momentsRow(m)
          }.toMap
        // frequent strings gate: only when distinct estimate < 100
        // (reference SummaryConverters.java:55-60); items come from the
        // column-level sketch (values string columns track are the same,
        // truncated at 256 chars)
        val frequent =
          if (unique != null && unique.getDouble(0) < 100 && st.freq != null) {
            val items = st.freq
              .getFrequentItems(org.apache.datasketches.frequencies.ErrorType.NO_FALSE_NEGATIVES)
              .toSeq.map(r => Row(r.getItem, r.getEstimate))
            if (items.isEmpty) null else items
          } else null
        Row(s.count, unique, momentsRow(s.length), momentsRow(s.tokenLength),
          charPos, frequent,
          if (s.theta == null) null else s.theta.getResult.toByteArrayCompressed)
      }

    val cardinality =
      if (st.hll == null) null
      else Row(st.hll.getEstimate, st.hll.getLowerBound(1),
        st.hll.getUpperBound(1), st.hll.toCompactByteArray)

    val freqItems =
      if (st.freq == null) null
      else st.freq.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES).toSeq
        .map(r => Row(r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))

    Row(st.count, st.nullCount, st.trueCount,
      inferred.toString, ratio, typeCounts,
      numbers, strings, cardinality, freqItems, st.serialize())
  }
}
