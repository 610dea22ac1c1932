package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.codegen.{CodeAndComment, CodeGenerator}
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Debug-only bridge into `private[sql]` codegen internals: enumerate every
  * whole-stage-codegen subtree of an (executed, possibly adaptive) plan and
  * report the compiled bytecode size of its largest generated method.
  * HotSpot never JIT-compiles a method past `-XX:HugeMethodLimit=8000`
  * bytecode bytes, and methods near the limit sit longest in the C2
  * compile queue — the sizes are the data for de-lotterizing a bench row
  * whose published number rides JIT tiering. Used by
  * [[graft.tools.MihCodegen]]; never on a query path.
  */
object GraftCodegenAudit {
  /** (whole-stage id, operator stack head, max generated-method bytecode
    * size) for every codegen subtree reachable through adaptive plans,
    * query stages and reused stages.
    */
  def methodSizes(plan: SparkPlan): Seq[(Int, String, Int)] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[WholeStageCodegenExec]
    def walk(p: SparkPlan): Unit = p.foreach {
      case w: WholeStageCodegenExec => seen += w
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case i: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        walk(i.relation.cachedPlan)
      case _ =>
    }
    walk(plan)
    seen.toSeq.map { w =>
      val (_, code: CodeAndComment) = w.doCodeGen()
      val (_, stats) = CodeGenerator.compile(code)
      val head = w.child.toString.linesIterator.take(6).mkString(" | ")
      (w.codegenStageId, head.take(300), stats.maxMethodCodeSize)
    }
  }
}
