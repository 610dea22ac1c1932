package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.profile.ProfileSession.ProfilingOps

/** Profile-driven expectation checks: pass/fail against known fixture
  * statistics, null/unprofiled-column behavior, plan shape (one explode,
  * no raw-data re-scan), and the allPass gate.
  */
class ValidationSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def prof = spark.read.parquet(s"$sfDir/lineitem.parquet")
    .newProfilingSession().groupBy("l_returnflag").aggProfiles()

  test("checks evaluate correct pass/fail against known fixture stats") {
    val rep = Validation.report(prof, Seq(
      Validation.MinAtLeast("l_quantity", 1.0), // min is 1 -> pass
      Validation.MinAtLeast("l_quantity", 5.0), // min is 1 -> fail
      Validation.MaxAtMost("l_quantity", 50.0), // max is 50 -> pass
      Validation.MeanBetween("l_quantity", 20.0, 30.0), // ~25.5 -> pass
      Validation.NullFractionAtMost("l_quantity", 0.0), // no nulls -> pass
      Validation.DistinctBetween("l_quantity", 40.0, 60.0), // 50 -> pass
      Validation.DistinctBetween("l_quantity", 0.0, 10.0), // 50 -> fail
      Validation.QuantileAtMost("l_quantity", 0.5, 40.0), // median ~25
      Validation.TypeIs("l_quantity", "FRACTIONAL"), // double col -> pass
      Validation.TypeIs("l_quantity", "STRING")), // -> fail
      keep = Seq("l_returnflag"))
    val byCheck = rep.collect()
      .groupBy(r => (r.getString(1), r.getDouble(3), r.getInt(4)))
    val verdicts = rep.collect()
      .map(r => (r.getString(1), r.getDouble(3).round, r.getInt(4)))
      .distinct.toSet
    verdicts should contain (("min_at_least", 1L, 1))
    verdicts should contain (("min_at_least", 1L, 0)) // the bound-5 variant
    verdicts.count(_._1 == "distinct_between") shouldBe 2
    verdicts.filter(_._1 == "distinct_between").map(_._3) shouldBe Set(1, 0)
    verdicts.filter(_._1 == "type_is").map(_._3) shouldBe Set(1, 0)
    byCheck.keys.map(_._1).toSet.size shouldBe 7 // distinct check names
  }

  test("report is profile-only: single explode, no re-scan of raw data") {
    val p = prof.persist()
    try {
      val rep = Validation.report(p, Seq(
        Validation.MinAtLeast("l_quantity", 1.0),
        Validation.MaxAtMost("l_extendedprice", 1e9)),
        keep = Seq("l_returnflag"))
      val plan = rep.queryExecution.optimizedPlan.toString
      "Generate".r.findAllIn(plan).length shouldBe 1
      rep.count() shouldBe 6L // 3 groups x 2 checks
    } finally { p.unpersist(); () }
  }

  test("allPass gates and failed expectations read 0, never null") {
    Validation.allPass(prof, Seq(
      Validation.MinAtLeast("l_quantity", 1.0),
      Validation.MaxAtMost("l_quantity", 50.0))) shouldBe true
    Validation.allPass(prof, Seq(
      Validation.MinAtLeast("l_quantity", 999.0))) shouldBe false
    // a numeric bound on a string column is inapplicable -> passed 0
    val rep = Validation.report(prof, Seq(
      Validation.MinAtLeast("l_linestatus", 0.0)))
    rep.collect().foreach(_.getInt(3) shouldBe 0)
  }
}
