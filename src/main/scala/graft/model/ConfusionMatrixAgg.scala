package graft.model

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.metrics.Moments

/** Confusion-matrix state: dynamically-grown (prediction, target) cell map,
  * each cell carrying a count and score moments — the engine's equivalent of
  * the reference's ClassificationMetrics
  * (/root/reference/core/src/main/java/com/whylogs/core/metrics/ClassificationMetrics.java:81-190).
  * Booleans canonicalize to "1"/"0" like the reference; labels sort
  * lexicographically in the output.
  */
final class ConfusionState extends Serializable {
  val cells: mutable.Map[(String, String), Moments] = mutable.Map.empty

  def update(pred: String, target: String, score: Double): Unit =
    cells.getOrElseUpdate((pred, target), new Moments).update(score)

  def merge(o: ConfusionState): Unit =
    o.cells.foreach { case (k, m) =>
      cells.getOrElseUpdate(k, new Moments).merge(m)
    }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(cells.size)
    cells.toSeq.sortBy(_._1).foreach { case ((p, t), m) =>
      out.writeUTF(p); out.writeUTF(t); m.write(out)
    }
    out.flush(); bos.toByteArray
  }
}

object ConfusionState {
  def deserialize(b: Array[Byte]): ConfusionState = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val s = new ConfusionState
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val p = in.readUTF(); val t = in.readUTF()
      s.cells((p, t)) = Moments.read(in)
      i += 1
    }
    s
  }

  val cellType: StructType = StructType(Seq(
    StructField("prediction", StringType),
    StructField("target", StringType),
    StructField("count", LongType),
    StructField("score_sum", DoubleType),
    StructField("score_mean", DoubleType),
    StructField("score_min", DoubleType),
    StructField("score_max", DoubleType),
    // centered second moment: lets the wire export rebuild the cell's
    // full variance tracker (ModelProfileMessage per-cell NumbersMessage)
    StructField("score_m2", DoubleType)))

  val schema: StructType = StructType(Seq(
    StructField("labels", ArrayType(StringType)),
    StructField("cells", ArrayType(cellType))))
}

/** One-pass grouped confusion matrix with per-cell score statistics. */
case class ConfusionMatrixAgg(
    prediction: Expression,
    target: Expression,
    score: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ConfusionState] {

  override def children: Seq[Expression] = Seq(prediction, target, score)
  override def nullable: Boolean = false
  override def dataType: DataType = ConfusionState.schema
  override def prettyName: String = "confusion_matrix_agg"

  @transient private lazy val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(ConfusionState.schema)

  private def labelOf(e: Expression, v: Any): String = e.dataType match {
    case StringType  => v.asInstanceOf[UTF8String].toString
    case BooleanType => if (v.asInstanceOf[Boolean]) "1" else "0"
    case _           => String.valueOf(v)
  }

  override def createAggregationBuffer(): ConfusionState = new ConfusionState

  override def update(st: ConfusionState, input: InternalRow): ConfusionState = {
    val p = prediction.eval(input)
    val t = target.eval(input)
    if (p != null && t != null) {
      val s = score.eval(input)
      val sd = if (s == null) 1.0 else s match {
        case d: java.lang.Double  => d.doubleValue()
        case f: java.lang.Float   => f.toDouble
        case l: java.lang.Long    => l.toDouble
        case i: java.lang.Integer => i.toDouble
        case x                    => String.valueOf(x).toDouble
      }
      st.update(labelOf(prediction, p), labelOf(target, t), sd)
    }
    st
  }

  override def merge(a: ConfusionState, b: ConfusionState): ConfusionState = {
    a.merge(b); a
  }

  override def eval(st: ConfusionState): Any = {
    val labels =
      (st.cells.keys.map(_._1) ++ st.cells.keys.map(_._2)).toSeq.distinct.sorted
    val cells = st.cells.toSeq.sortBy(_._1).map { case ((p, t), m) =>
      Row(p, t, m.count, m.sum, m.mean, m.min, m.max, m.m2)
    }
    toCatalyst(Row(labels, cells))
  }

  override def serialize(st: ConfusionState): Array[Byte] = st.serialize()
  override def deserialize(b: Array[Byte]): ConfusionState =
    ConfusionState.deserialize(b)

  override def withNewMutableAggBufferOffset(o: Int): ConfusionMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ConfusionMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(prediction = c(0), target = c(1), score = c(2))
}
