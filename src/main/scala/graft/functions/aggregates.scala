package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union => HllUnion}
import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Union => ThetaUnion}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.metrics.{ColumnProfileState, ProfileConfig}
import graft.profile.ProfileSchema

/** Whole-column profiling aggregate: one pass over the column produces the
  * full queryable profile struct ([[graft.profile.ProfileSchema.schema]]).
  *
  * Equivalent surface to the reference's DatasetProfileAggregator
  * (/root/reference/spark/src/main/scala/org/apache/spark/whylogs/DatasetProfileAggregator.scala:33-123)
  * but per-column with a compact hand-serialized binary buffer (no Java
  * serialization across the shuffle) — Catalyst plans it as
  * ObjectHashAggregate with map-side partial aggregation, so profiling any
  * number of columns stays a single shuffle whose payload is sketch bytes,
  * independent of input row count.
  *
  * Value routing is static on the child's DataType; StringType columns can
  * additionally opt into dynamic string->number inference via
  * [[ProfileConfig.stringMatching]]. Timestamps/dates are profiled as
  * INTEGRAL (epoch micros / days) — unlike the reference, which degrades
  * them to UNKNOWN.
  */
trait ColumnProfileAggBase extends TypedImperativeAggregate[ColumnProfileState] {
  def child: Expression
  def cfg: ProfileConfig

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ColumnProfileState =
    new ColumnProfileState(cfg)

  private type Tracker = (ColumnProfileState, Any) => Unit

  /** Static value routing, RECURSIVE over container types: an array (or
    * map-value) column profiles its ELEMENTS in-row — the aggregate
    * walks the ArrayData inside update, no explode, no extra shuffle —
    * so `count` for a container column counts tracked elements, null
    * elements land in null_count, and a NULL container itself counts
    * one null (the reference degrades every non-primitive value to
    * UNKNOWN, TypedDataConverter.java:32-60). Nested containers
    * (array<array<...>>) recurse. Structs are expanded STATICALLY to
    * dotted leaf columns by [[graft.profile.ProfileSession.flattenNested]]
    * (a struct is a fixed set of columns, not a collection) and remain
    * UNKNOWN when passed unexpanded.
    */
  private def trackerFor(dt: DataType): Tracker = dt match {
    case ByteType    => (st, v) => st.trackLong(v.asInstanceOf[Byte].toLong)
    case ShortType   => (st, v) => st.trackLong(v.asInstanceOf[Short].toLong)
    case IntegerType => (st, v) => st.trackLong(v.asInstanceOf[Int].toLong)
    case LongType    => (st, v) => st.trackLong(v.asInstanceOf[Long])
    case FloatType   => (st, v) => st.trackDouble(v.asInstanceOf[Float].toDouble)
    case DoubleType  => (st, v) => st.trackDouble(v.asInstanceOf[Double])
    case _: DecimalType =>
      (st, v) => st.trackDouble(v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble)
    case BooleanType => (st, v) => st.trackBoolean(v.asInstanceOf[Boolean])
    case StringType  => (st, v) => st.trackString(v.asInstanceOf[UTF8String].toString)
    case TimestampType | TimestampNTZType =>
      (st, v) => st.trackLong(v.asInstanceOf[Long])
    case DateType => (st, v) => st.trackLong(v.asInstanceOf[Int].toLong)
    case ArrayType(et, _) =>
      val elem = trackerFor(et)
      (st, v) => {
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val n = arr.numElements()
        var i = 0
        while (i < n) {
          if (arr.isNullAt(i)) st.trackNull() else elem(st, arr.get(i, et))
          i += 1
        }
      }
    case MapType(_, vt, _) =>
      // profile map VALUES (keys are usually identifiers; a key profile
      // is map_keys(col) away via flattenNested's value semantics)
      val value = trackerFor(vt)
      (st, v) => {
        val m = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val vals = m.valueArray()
        val n = m.numElements()
        var i = 0
        while (i < n) {
          if (vals.isNullAt(i)) st.trackNull() else value(st, vals.get(i, vt))
          i += 1
        }
      }
    case _ =>
      (st, _) => { st.count += 1; st.schema.track(graft.types.InferredType.Unknown) }
  }

  @transient private lazy val track: Tracker = trackerFor(child.dataType)

  /** Primitive-column fast path (r17): after binding, a plain column
    * child is a BoundReference, and `child.eval` would box every
    * numeric cell (365M Long/Double allocations per wide608 pass)
    * purely to route it through the Any-typed tracker. Reading the
    * primitive straight off the InternalRow keeps the update loop
    * allocation-free for the five fixed-width types; every other
    * child shape (expressions, strings, containers) keeps the generic
    * eval route. Null semantics identical: isNullAt -> trackNull.
    */
  @transient private lazy val primitiveUpdate:
      (ColumnProfileState, InternalRow) => Unit = child match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference =>
      val ord = b.ordinal
      b.dataType match {
        // numeric cells go through the state's 256-value buffer (cache
        // locality, see ColumnProfileState) — same sequence, delayed,
        // bit-identical; flush happens at serialize/merge/eval
        case LongType => (st, row) =>
          if (row.isNullAt(ord)) st.trackNull()
          else st.bufferLong(row.getLong(ord))
        case IntegerType => (st, row) =>
          if (row.isNullAt(ord)) st.trackNull()
          else st.bufferLong(row.getInt(ord).toLong)
        case DoubleType => (st, row) =>
          if (row.isNullAt(ord)) st.trackNull()
          else st.bufferDouble(row.getDouble(ord))
        case FloatType => (st, row) =>
          if (row.isNullAt(ord)) st.trackNull()
          else st.bufferDouble(row.getFloat(ord).toDouble)
        case BooleanType => (st, row) =>
          if (row.isNullAt(ord)) st.trackNull()
          else st.trackBoolean(row.getBoolean(ord))
        case _ => null
      }
    case _ => null
  }

  override def update(st: ColumnProfileState, input: InternalRow): ColumnProfileState = {
    val fast = primitiveUpdate
    if (fast != null) { fast(st, input); return st }
    val v = child.eval(input)
    if (v == null) st.trackNull() else track(st, v)
    st
  }

  override def merge(a: ColumnProfileState, b: ColumnProfileState): ColumnProfileState = {
    a.merge(b); a
  }

  override def serialize(st: ColumnProfileState): Array[Byte] = st.serialize()
  override def deserialize(bytes: Array[Byte]): ColumnProfileState =
    ColumnProfileState.deserialize(bytes)
}

/** [[ColumnProfileAggBase]] finishing to the full queryable profile
  * struct — THE profile aggregate.
  */
case class ColumnProfileAgg(
    child: Expression,
    cfg: ProfileConfig = ProfileConfig.default,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends ColumnProfileAggBase {

  override def dataType: DataType = ProfileSchema.schema
  override def prettyName: String = "graft_profile"

  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(ProfileSchema.schema)

  override def eval(st: ColumnProfileState): Any = {
    st.flush()
    toCatalyst(ProfileSchema.summarize(st))
  }

  override def withNewMutableAggBufferOffset(o: Int): ColumnProfileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ColumnProfileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** [[ColumnProfileAggBase]] finishing to the RAW serialized state — the
  * intermediate level of the wide-profile per-column merge plan
  * ([[graft.profile.ProfileSession.aggProfiles]]). Summarizing a profile
  * (quantile grid, histogram, frequent items, Catalyst conversion of the
  * ~60-field struct) costs ~ms per state; the wide plan's intermediate
  * level would pay it partitions x columns times for rows whose ONLY
  * consumer is profile_merge, which reads just the state bytes
  * (stage-metered at 608 columns: the summarize level was ~half the row's
  * wall). `profile_merge` accepts these binaries directly (its BinaryType
  * child route) and summarizes ONCE per column at the end.
  */
case class ColumnProfileStateAgg(
    child: Expression,
    cfg: ProfileConfig = ProfileConfig.default,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends ColumnProfileAggBase {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_profile_state"

  override def eval(st: ColumnProfileState): Any = {
    st.flush()
    st.serialize()
  }

  override def withNewMutableAggBufferOffset(o: Int): ColumnProfileStateAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ColumnProfileStateAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Re-aggregation of stored profiles: merges the monoid `state` of profile
  * structs (or raw state binaries) produced by [[ColumnProfileAgg]] — the
  * engine's time-rollup / cross-run merge, equivalent to the reference's
  * DatasetProfileMerger (/root/reference/spark/src/main/scala/org/apache/spark/whylogs/DatasetProfileMerger.scala:19-37).
  */
case class ProfileMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ColumnProfileState] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ProfileSchema.schema
  override def prettyName: String = "graft_profile_merge"

  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(ProfileSchema.schema)

  @transient private lazy val stateIdx: Int = child.dataType match {
    case s: StructType => s.fieldIndex("state")
    case _             => -1 // BinaryType: raw state bytes
  }

  override def createAggregationBuffer(): ColumnProfileState =
    new ColumnProfileState(ProfileConfig.default, allocate = false)

  override def update(st: ColumnProfileState, input: InternalRow): ColumnProfileState = {
    val v = child.eval(input)
    if (v == null) return st
    val bytes =
      if (stateIdx < 0) v.asInstanceOf[Array[Byte]]
      else {
        val row = v.asInstanceOf[InternalRow]
        if (row.isNullAt(stateIdx)) return st
        row.getBinary(stateIdx)
      }
    st.merge(ColumnProfileState.deserialize(bytes))
    st
  }

  override def merge(a: ColumnProfileState, b: ColumnProfileState): ColumnProfileState = {
    a.merge(b); a
  }

  override def eval(st: ColumnProfileState): Any = {
    st.flush()
    toCatalyst(ProfileSchema.summarize(st))
  }

  override def serialize(st: ColumnProfileState): Array[Byte] = st.serialize()
  override def deserialize(bytes: Array[Byte]): ColumnProfileState =
    ColumnProfileState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): ProfileMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ProfileMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** KLL quantile sketch aggregate over a numeric column -> serialized sketch
  * bytes. Values are sketched as Float, like the reference
  * (/root/reference/core/src/main/java/com/whylogs/core/statistics/NumberTracker.java:45).
  */
case class KllAgg(
    child: Expression,
    k: Int = 256,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllFloatsSketch] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_agg"

  @transient private lazy val toDouble: Any => Double = child.dataType match {
    case ByteType       => v => v.asInstanceOf[Byte].toDouble
    case ShortType      => v => v.asInstanceOf[Short].toDouble
    case IntegerType    => v => v.asInstanceOf[Int].toDouble
    case LongType       => v => v.asInstanceOf[Long].toDouble
    case FloatType      => v => v.asInstanceOf[Float].toDouble
    case DoubleType     => v => v.asInstanceOf[Double]
    case _: DecimalType => v => v.asInstanceOf[Decimal].toDouble
    case other => throw new IllegalArgumentException(
      s"kll_agg requires a numeric column, got $other")
  }

  override def createAggregationBuffer(): KllFloatsSketch =
    KllFloatsSketch.newHeapInstance(k)

  override def update(buf: KllFloatsSketch, input: InternalRow): KllFloatsSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = toDouble(v)
      if (!java.lang.Double.isNaN(d)) buf.update(d.toFloat)
    }
    buf
  }

  override def merge(a: KllFloatsSketch, b: KllFloatsSketch): KllFloatsSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllFloatsSketch): Any = buf.toByteArray
  override def serialize(buf: KllFloatsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(b))

  override def withNewMutableAggBufferOffset(o: Int): KllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Merge aggregate over serialized KLL sketch bytes (re-aggregation). */
case class KllMergeAgg(
    child: Expression,
    k: Int = 256,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllFloatsSketch] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllFloatsSketch =
    KllFloatsSketch.newHeapInstance(k)

  override def update(buf: KllFloatsSketch, input: InternalRow): KllFloatsSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllFloatsSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: KllFloatsSketch, b: KllFloatsSketch): KllFloatsSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllFloatsSketch): Any = buf.toByteArray
  override def serialize(buf: KllFloatsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(b: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(b))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Theta distinct-count sketch aggregate -> compressed compact sketch bytes.
  * Numerics update as double (matching the reference's NumberTracker),
  * strings as String, binaries as bytes — so sketches over the same logical
  * values from different runs are set-algebra compatible.
  */
case class ThetaAgg(
    child: Expression,
    nominalEntries: Int = 4096,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaUnion] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_agg"

  @transient private lazy val doUpdate: (ThetaUnion, Any) => Unit =
    child.dataType match {
      case ByteType    => (u, v) => u.update(v.asInstanceOf[Byte].toDouble)
      case ShortType   => (u, v) => u.update(v.asInstanceOf[Short].toDouble)
      case IntegerType => (u, v) => u.update(v.asInstanceOf[Int].toDouble)
      case LongType    => (u, v) => u.update(v.asInstanceOf[Long].toDouble)
      case FloatType   => (u, v) => u.update(v.asInstanceOf[Float].toDouble)
      case DoubleType  => (u, v) => u.update(v.asInstanceOf[Double])
      case _: DecimalType => (u, v) => u.update(v.asInstanceOf[Decimal].toDouble)
      case StringType  => (u, v) => u.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType  => (u, v) => u.update(v.asInstanceOf[Array[Byte]])
      case BooleanType => (u, v) => u.update(if (v.asInstanceOf[Boolean]) 1.0 else 0.0)
      case TimestampType | TimestampNTZType => (u, v) => u.update(v.asInstanceOf[Long])
      case DateType    => (u, v) => u.update(v.asInstanceOf[Int].toLong)
      case other => throw new IllegalArgumentException(
        s"theta_agg does not support $other")
    }

  override def createAggregationBuffer(): ThetaUnion =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buf: ThetaUnion, input: InternalRow): ThetaUnion = {
    val v = child.eval(input)
    if (v != null) doUpdate(buf, v)
    buf
  }

  override def merge(a: ThetaUnion, b: ThetaUnion): ThetaUnion = {
    a.union(b.getResult); a
  }

  override def eval(buf: ThetaUnion): Any = buf.getResult.toByteArrayCompressed
  override def serialize(buf: ThetaUnion): Array[Byte] =
    buf.getResult.toByteArrayCompressed
  override def deserialize(b: Array[Byte]): ThetaUnion = {
    val u = SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()
    u.union(CompactSketch.heapify(Memory.wrap(b)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Merge aggregate over serialized theta sketch bytes. */
case class ThetaMergeAgg(
    child: Expression,
    nominalEntries: Int = 4096,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaUnion] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_merge_agg"

  override def createAggregationBuffer(): ThetaUnion =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buf: ThetaUnion, input: InternalRow): ThetaUnion = {
    val v = child.eval(input)
    if (v != null)
      buf.union(CompactSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: ThetaUnion, b: ThetaUnion): ThetaUnion = {
    a.union(b.getResult); a
  }

  override def eval(buf: ThetaUnion): Any = buf.getResult.toByteArrayCompressed
  override def serialize(buf: ThetaUnion): Array[Byte] =
    buf.getResult.toByteArrayCompressed
  override def deserialize(b: Array[Byte]): ThetaUnion = {
    val u = SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()
    u.union(CompactSketch.heapify(Memory.wrap(b)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** HLL cardinality sketch aggregate -> compact HLL bytes (lgK default 12,
  * as the reference's cardinality tracker, ColumnProfile.java:39).
  */
case class HllAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllSketch] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_agg"

  @transient private lazy val doUpdate: (HllSketch, Any) => Unit =
    child.dataType match {
      case ByteType    => (u, v) => u.update(v.asInstanceOf[Byte].toLong)
      case ShortType   => (u, v) => u.update(v.asInstanceOf[Short].toLong)
      case IntegerType => (u, v) => u.update(v.asInstanceOf[Int].toLong)
      case LongType    => (u, v) => u.update(v.asInstanceOf[Long])
      case FloatType   => (u, v) => u.update(v.asInstanceOf[Float].toDouble)
      case DoubleType  => (u, v) => u.update(v.asInstanceOf[Double])
      case _: DecimalType => (u, v) => u.update(v.asInstanceOf[Decimal].toDouble)
      case StringType  => (u, v) => u.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType  => (u, v) => u.update(v.asInstanceOf[Array[Byte]])
      case TimestampType | TimestampNTZType => (u, v) => u.update(v.asInstanceOf[Long])
      case DateType    => (u, v) => u.update(v.asInstanceOf[Int].toLong)
      case other => throw new IllegalArgumentException(
        s"hll_agg does not support $other")
    }

  override def createAggregationBuffer(): HllSketch = new HllSketch(lgK)

  override def update(buf: HllSketch, input: InternalRow): HllSketch = {
    val v = child.eval(input)
    if (v != null) doUpdate(buf, v)
    buf
  }

  override def merge(a: HllSketch, b: HllSketch): HllSketch = {
    val u = new HllUnion(lgK)
    u.update(a); u.update(b)
    u.getResult(TgtHllType.HLL_4)
  }

  override def eval(buf: HllSketch): Any = buf.toCompactByteArray
  override def serialize(buf: HllSketch): Array[Byte] = buf.toCompactByteArray
  override def deserialize(b: Array[Byte]): HllSketch = HllSketch.heapify(b)

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Merge aggregate over serialized HLL bytes. */
case class HllMergeAgg(
    child: Expression,
    lgK: Int = 12,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllUnion] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_merge_agg"

  override def createAggregationBuffer(): HllUnion = new HllUnion(lgK)

  override def update(buf: HllUnion, input: InternalRow): HllUnion = {
    val v = child.eval(input)
    if (v != null) buf.update(HllSketch.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: HllUnion, b: HllUnion): HllUnion = {
    a.update(b.getResult(TgtHllType.HLL_4)); a
  }

  override def eval(buf: HllUnion): Any =
    buf.getResult(TgtHllType.HLL_4).toCompactByteArray
  override def serialize(buf: HllUnion): Array[Byte] =
    buf.getResult(TgtHllType.HLL_4).toCompactByteArray
  override def deserialize(b: Array[Byte]): HllUnion = {
    val u = new HllUnion(lgK)
    u.update(HllSketch.heapify(b))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Frequent-items (heavy hitters) sketch aggregate over strings -> sketch
  * bytes. maxMapSize=128 matches the reference
  * (/root/reference/core/src/main/java/com/whylogs/core/utils/sketches/FrequentStringsSketch.java:14-19).
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int = 128,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_items_agg"

  @transient private lazy val serde = new ArrayOfStringsSerDe

  @transient private lazy val toStr: Any => String = child.dataType match {
    case StringType => v => v.asInstanceOf[UTF8String].toString
    case _          => v => String.valueOf(v)
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(toStr(v))
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
    a.merge(b); a
  }

  override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serde)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] = buf.toByteArray(serde)
  override def deserialize(b: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance[String](Memory.wrap(b), serde)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Merge aggregate over serialized frequent-items sketch bytes. */
case class FreqItemsMergeAgg(
    child: Expression,
    maxMapSize: Int = 128,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "freq_items_merge_agg"

  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(ItemsSketch.getInstance[String](
        Memory.wrap(v.asInstanceOf[Array[Byte]]), serde))
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] = {
    a.merge(b); a
  }

  override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serde)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] = buf.toByteArray(serde)
  override def deserialize(b: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance[String](Memory.wrap(b), serde)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
