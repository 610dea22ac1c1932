package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded top-k buffer: the k best (score, id) pairs under score desc,
  * id asc (`ord` orders ids in their native Catalyst representation).
  * Insertion is O(1) reject below the current floor / O(k) accept (k is
  * small); merge inserts the other side's entries.
  */
final class TopKState(val k: Int, val ord: Ordering[Any]) {
  val scores = new Array[Double](k)
  val ids = new Array[Any](k)
  var size = 0
  private var worst = -1 // index of the current floor entry, -1 if size<k

  @inline private def better(s1: Double, i1: Any, s2: Double, i2: Any): Boolean =
    s1 > s2 || (s1 == s2 && ord.compare(i1, i2) < 0)

  def insert(score: Double, id: Any): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
      if (size == k) rescanWorst()
    } else if (better(score, id, scores(worst), ids(worst))) {
      scores(worst) = score; ids(worst) = id
      rescanWorst()
    }
  }

  private def rescanWorst(): Unit = {
    var w = 0
    var i = 1
    while (i < size) {
      if (better(scores(w), ids(w), scores(i), ids(i))) w = i
      i += 1
    }
    worst = w
  }

  def merge(o: TopKState): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.ids(i)); i += 1 }
  }

  /** Entries sorted score desc, id asc. */
  def sorted: Array[(Double, Any)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith { case ((s1, i1), (s2, i2)) => better(s1, i1, s2, i2) }
}

/** Top-k aggregate: `groupBy(query).agg(topk_agg(score, id, k))` keeps only
  * the k best rows per group ON THE MAP SIDE — Catalyst plans it as
  * ObjectHashAggregate with partial aggregation, so each partition
  * contributes at most k entries per group to the shuffle instead of every
  * scored row. This is the scale fix for top-k-over-cross-product plans
  * (the window row_number() <= k formulation shuffles ALL scored rows).
  *
  * Output: array<struct<item_id: <id type>, score: double>> sorted score
  * desc, ties id asc. Ids keep their native Catalyst type (long, string,
  * date, …); unsupported id types are rejected at analysis time.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item_id", id.dataType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_agg"

  private def idTypeSupported(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | TimestampNTZType | FloatType | DoubleType |
        BooleanType | StringType | BinaryType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!score.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg score must be numeric, got ${score.dataType.catalogString}")
    else if (!idTypeSupported(id.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg id type ${id.dataType.catalogString} is not supported " +
          "(use an integral, temporal, float, boolean, string or binary id)")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val toDouble: Any => Double = score.dataType match {
    case DoubleType  => v => v.asInstanceOf[Double]
    case FloatType   => v => v.asInstanceOf[Float].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case LongType    => v => v.asInstanceOf[Long].toDouble
    case ShortType   => v => v.asInstanceOf[Short].toDouble
    case ByteType    => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType =>
      v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case other => throw new IllegalArgumentException(s"topk_agg score: $other")
  }

  /** Buffer-reused values (UTF8String, byte[]) must be copied before they
    * outlive the input row; immutable primitives pass through.
    */
  @transient private lazy val copyId: Any => Any = id.dataType match {
    case StringType => v => v.asInstanceOf[UTF8String].clone()
    case BinaryType => v => v.asInstanceOf[Array[Byte]].clone()
    case _          => identity
  }

  @transient private lazy val idOrd: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(id.dataType)

  override def createAggregationBuffer(): TopKState = new TopKState(k, idOrd)

  override def update(st: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) st.insert(toDouble(s), copyId(i))
    st
  }

  override def merge(a: TopKState, b: TopKState): TopKState = { a.merge(b); a }

  override def eval(st: TopKState): Any =
    new GenericArrayData(st.sorted.map { case (s, i) =>
      InternalRow(i, s)
    }.asInstanceOf[Array[Any]])

  private def writeId(out: DataOutputStream, v: Any): Unit = id.dataType match {
    case ByteType    => out.writeByte(v.asInstanceOf[Byte].toInt)
    case ShortType   => out.writeShort(v.asInstanceOf[Short].toInt)
    case IntegerType | DateType => out.writeInt(v.asInstanceOf[Int])
    case LongType | TimestampType | TimestampNTZType =>
      out.writeLong(v.asInstanceOf[Long])
    case FloatType   => out.writeFloat(v.asInstanceOf[Float])
    case DoubleType  => out.writeDouble(v.asInstanceOf[Double])
    case BooleanType => out.writeBoolean(v.asInstanceOf[Boolean])
    case StringType =>
      val b = v.asInstanceOf[UTF8String].getBytes
      out.writeInt(b.length); out.write(b)
    case BinaryType =>
      val b = v.asInstanceOf[Array[Byte]]
      out.writeInt(b.length); out.write(b)
    case other => throw new IllegalArgumentException(s"topk_agg id: $other")
  }

  private def readId(in: DataInputStream): Any = id.dataType match {
    case ByteType    => in.readByte()
    case ShortType   => in.readShort()
    case IntegerType | DateType => in.readInt()
    case LongType | TimestampType | TimestampNTZType => in.readLong()
    case FloatType   => in.readFloat()
    case DoubleType  => in.readDouble()
    case BooleanType => in.readBoolean()
    case StringType =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      UTF8String.fromBytes(b)
    case BinaryType =>
      val b = new Array[Byte](in.readInt()); in.readFully(b)
      b
    case other => throw new IllegalArgumentException(s"topk_agg id: $other")
  }

  override def serialize(st: TopKState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(st.k); out.writeInt(st.size)
    var i = 0
    while (i < st.size) {
      out.writeDouble(st.scores(i)); writeId(out, st.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }
  override def deserialize(b: Array[Byte]): TopKState = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val st = new TopKState(in.readInt(), idOrd)
    val n = in.readInt()
    var i = 0
    while (i < n) { st.insert(in.readDouble(), readId(in)); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

/** Elementwise sum of array<float|double> columns -> array<double>. Used by
  * Lloyd centroid refinement: `groupBy(centroid).agg(vec_sum(emb), count)`
  * replaces posexplode + per-(centroid,pos) aggregation, which multiplied
  * the shuffle by the embedding dimensionality.
  */
case class VecSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sum"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"vec_sum: $other")
  }

  override def createAggregationBuffer(): Array[Double] = Array.empty

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    val acc = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
    var i = 0
    if (isFloat) while (i < n) { acc(i) += a.getFloat(i); i += 1 }
    else while (i < n) { acc(i) += a.getDouble(i); i += 1 }
    acc
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeDouble)
    out.flush(); bos.toByteArray
  }
  override def deserialize(b: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    Array.fill(in.readInt())(in.readDouble())
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Elementwise minimum of array<long> columns — the MinHash signature
  * reducer: `groupBy(id).agg(vec_min(hashes))` replaces numHashes separate
  * min() aggregate columns with one aggregate (dramatically smaller
  * generated code, identical math and shuffle payload).
  */
case class VecMinAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_min"

  override def createAggregationBuffer(): Array[Long] = Array.empty

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    if (buf.length == 0) {
      val fresh = new Array[Long](n)
      var i = 0
      while (i < n) { fresh(i) = a.getLong(i); i += 1 }
      fresh
    } else {
      var i = 0
      while (i < n && i < buf.length) {
        val x = a.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
      buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.length == 0) return b
    if (b.length == 0) return a
    var i = 0
    while (i < a.length && i < b.length) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    out.putInt(buf.length)
    buf.foreach(out.putLong)
    out.array()
  }
  override def deserialize(b: Array[Byte]): Array[Long] = {
    val in = java.nio.ByteBuffer.wrap(b)
    Array.fill(in.getInt())(in.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): VecMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
