package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.execution.SparkPlan

/** The measured-count route in [[EventStats.trendSlope]] (r13 verdict:
  * the doc-only "bucket first" contract let a caller plan a silent
  * O(n^2) corpus self-cross-join; the fix is the knnLabelNoise
  * precedent — probe, then route):
  *
  *  - at or under `maxExactPoints` the op keeps the EXACT all-pairs
  *    median (n_pairs == n(n-1)/2) — the plan legitimately contains
  *    the self-cross, which is why q250 sits in the cartesian
  *    canary's allowlist;
  *  - above it the op plans the hash-bucketed equi-join sampler: NO
  *    cartesian/nested-loop over the series (pinned on the physical
  *    plan), a visible sampled n_pairs, and an estimate that agrees
  *    with the exact median on a majority-clean series (every clean
  *    pair's slope is identical, so the sampled median is exact).
  */
class TrendSlopeRouteSpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val nested = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case s: InMemoryTableScanExec => walk(s.relation.cachedPlan)
      case _ => Nil
    }
    (p +: nested) ++ p.children.flatMap(walk) ++ p.subqueries.flatMap(walk)
  }

  // a 200-point line (slope 2) with 10% wild outliers
  private def series200 = {
    import spark.implicits._
    (0L until 200L).map(t =>
      (t, if (t % 10 == 7) 1000.0 - 3.0 * t else 2.0 * t + 5.0))
      .toDF("t", "v")
  }

  test("n <= maxExactPoints keeps the exact all-pairs path " +
    "(n_pairs = n(n-1)/2, boundary inclusive)") {
    val r = ModelEvalHelpers.one(
      EventStats.trendSlope(series200, "t", "v", maxExactPoints = 200))
    r.getLong(0) shouldBe 200L
    r.getLong(1) shouldBe (200L * 199L / 2)
    r.getDouble(2) shouldBe (2.0 +- 1e-9) // robust to the planted 10%
  }

  test("n > maxExactPoints routes to the bucketed sampler: " +
    "no cartesian in the plan, sampled n_pairs, agreeing median") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val df = EventStats.trendSlope(series200, "t", "v",
      maxExactPoints = 100, pairBucketSize = 16)
    val plan = df.queryExecution.sparkPlan
    val cartesians = walk(plan).collect { case c: CartesianProductExec => c }
    cartesians shouldBe empty
    // the only nested-loop joins are the 1-row tmin/median broadcasts:
    // each must have a side DOMINATED by an aggregate (the canary's
    // boundedness walk — only unary nodes between root and aggregate)
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    @annotation.tailrec
    def aggDominated(p: SparkPlan): Boolean = p match {
      case _: BaseAggregateExec => true
      case u if u.children.size == 1 => aggDominated(u.children.head)
      case _ => false
    }
    val bnljs = walk(plan).collect { case b: BroadcastNestedLoopJoinExec => b }
    bnljs.foreach { b =>
      assert(aggDominated(b.left) || aggDominated(b.right),
        s"nested-loop join without a 1-row-aggregate side:\n$b")
    }

    val r = ModelEvalHelpers.one(df)
    r.getLong(0) shouldBe 200L
    val full = 200L * 199L / 2
    r.getLong(1) should be < full
    r.getLong(1) should be > 200L // ~ n * bucket/2 pairs, far above n
    // clean pairs all have slope exactly 2.0 and dominate any bucket
    // sample, so the sampled median equals the exact one
    r.getDouble(2) shouldBe (2.0 +- 1e-9)
  }

  test("default budget keeps bucketed series exact " +
    "(a year of hours = 8.8k points < 20k)") {
    import spark.implicits._
    val n = 500
    val line = (0 until n).map(t => (t.toLong, 0.5 * t)).toDF("t", "v")
    val r = ModelEvalHelpers.one(EventStats.trendSlope(line, "t", "v"))
    r.getLong(1) shouldBe (n.toLong * (n - 1) / 2)
    r.getDouble(2) shouldBe (0.5 +- 1e-12)
  }
}
