package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** EXACT membership of a 64-bit hash in a broadcast sorted-long-array
  * set: the [[BloomMightContainBroadcast]] shape with binary search in
  * place of bit probes. The array ships once per executor via torrent
  * broadcast and is shared by every task; per-row work is one
  * O(log n) search over a primitive array — no per-row byte copies, no
  * join in the plan, codegen-friendly (a single method call in the
  * generated code).
  *
  * Use where FALSE POSITIVES ARE NOT ACCEPTABLE (e.g. novelty scoring,
  * where a Bloom false positive silently undercounts novel grams) and
  * the set fits executor memory (8 bytes per entry: 10^8 grams = 800 MB
  * — beyond that, use the stored-table join form,
  * [[graft.ops.TextOps.ngramNoveltyStored]]).
  */
case class InSortedLongSetBroadcast(
    set: org.apache.spark.broadcast.Broadcast[Array[Long]],
    child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "in_sorted_long_set"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"in_sorted_long_set requires a bigint hash, got $other")
    }

  def probe(h: Long): Boolean =
    java.util.Arrays.binarySearch(set.value, h) >= 0

  override def nullSafeEval(hash: Any): Any = probe(hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("setProbe", this,
      classOf[InSortedLongSetBroadcast].getName)
    defineCodeGen(ctx, ev, h => s"$ref.probe($h)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
