package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Repartition}
import org.apache.spark.sql.catalyst.rules.Rule

/** Ship the NARROW rows through a round-robin shuffle, not the widened
  * ones: rewrites `Repartition(shuffle = true, Project)` to
  * `Project(Repartition(...))` when the projection is deterministic and
  * strictly WIDENS the row (by static `defaultSize` of the schemas).
  *
  * Motivation: [[graft.profile.ProfileSession.aggProfiles]]'s
  * update-parallelize rule repartitions under-split inputs before the
  * CPU-heavy profile aggregate. When the profiled frame is a widening
  * projection of a narrow source — a 608-column synthetic view over 8
  * parquet columns, or flattenNested's leaf expansion — the exchange
  * would otherwise serialize the WIDE rows (608 doubles ~ 2.9 GB at
  * sf0.1) when shuffling the 8 source columns (~38 MB) and projecting
  * AFTER the exchange computes the identical result: a round-robin
  * exchange references no columns, and a deterministic projection
  * commutes with any row routing.
  *
  * Guards: only `shuffle = true` Repartition (round-robin — a
  * RepartitionByExpression depends on its key columns, untouched), only
  * fully deterministic projections (a rand() column must be computed
  * exactly once per row, before OR after the shuffle is NOT equivalent
  * across retries), and only when the projection strictly widens (a
  * narrowing projection below the exchange is already optimal — Catalyst
  * column pruning put it there).
  *
  * Registered by [[graft.GraftExtensions]] (injectOptimizerRule) and
  * installed lazily into `spark.experimental.extraOptimizations` by
  * ProfileSession, so the optimization applies with or without the
  * extensions conf. The rule is idempotent: the rewritten shape no
  * longer matches the pattern.
  */
object NarrowRepartitionRule extends Rule[LogicalPlan] {

  private def width(
      attrs: Iterable[org.apache.spark.sql.catalyst.expressions.Attribute])
      : Long =
    attrs.map(_.dataType.defaultSize.toLong).sum

  /** Guards are judged on the projection's REFERENCED attributes, not
    * the child's full output: after the hoist the later pruning batch
    * strips unreferenced child columns below the exchange, so the
    * references are exactly what the shuffle will carry. Two
    * consequences: (1) a source whose UNREAD columns are strings (the
    * lineitem-derived wide profile) still hoists — the strings never
    * ride; (2) a projection that actually READS variable-length
    * columns must not hoist, because static defaultSize counts a
    * string as ~20 bytes regardless of real length — a projection
    * deriving many numerics from LARGE text would be misclassified as
    * "widening" and the hoist would ship the fat text rows (the
    * opposite of the rule's intent). The first guard implementation
    * (r17) checked the child's full output and silently disabled the
    * hoist for every table with ANY string column — measured
    * profile_wide608 23.7 -> 34.1 s before the fix.
    */
  private def fixedType(
      a: org.apache.spark.sql.catalyst.expressions.Attribute): Boolean =
    a.dataType match {
      case _: org.apache.spark.sql.types.StringType => false
      case org.apache.spark.sql.types.BinaryType => false
      case _: org.apache.spark.sql.types.ArrayType => false
      case _: org.apache.spark.sql.types.MapType => false
      case _: org.apache.spark.sql.types.StructType => false
      case _ => true
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // n >= numShufflePartitions: the rewrite moves the projection AFTER
    // the exchange, so its compute parallelism becomes n — only hoist
    // when n is at least the session's standard parallelism (the
    // profile parallelize rule repartitions to exactly that). A user's
    // .select(wide).repartition(1) must keep computing the projection
    // on the upstream partitions, not serialize it through one task.
    case Repartition(n, true, p @ Project(list, child))
        if n >= conf.numShufflePartitions &&
          list.forall(_.deterministic) &&
          p.references.forall(fixedType) &&
          width(p.output) > width(p.references) =>
      Project(list, Repartition(n, shuffle = true, child))
  }
}
