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

  test("dispersion / uniqueness / boolean checks verdict correctly") {
    import spark.implicits._
    val rep = Validation.report(prof, Seq(
      Validation.StddevBetween("l_quantity", 10.0, 20.0), // ~14.4 -> pass
      Validation.StddevBetween("l_quantity", 0.0, 1.0), // -> fail
      Validation.UniqueRatioBetween("l_quantity", 0.0, 0.1), // ~0.004
      Validation.UniqueRatioBetween("l_quantity", 0.5, 1.0))) // -> fail
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getInt(3)))
    rep.filter(r => r._1 == "stddev_between" && r._3 == 1)
      .foreach(r => r._2 should (be > 10.0 and be < 20.0))
    rep.count(_._3 == 1) shouldBe 6 // 3 groups x 2 passing variants
    rep.count(_._3 == 0) shouldBe 6

    // boolean column: true fraction from the profile's true_count
    val flags = (1 to 100).map(i => ("g", i % 4 == 0)).toDF("g", "ok")
      .newProfilingSession().groupBy("g").aggProfiles()
    val boolRep = Validation.report(flags, Seq(
      Validation.TrueFractionAtLeast("ok", 0.2), // 0.25 -> pass
      Validation.TrueFractionAtLeast("ok", 0.5))) // -> fail
      .collect().map(r => (r.getDouble(2), r.getInt(3)))
    boolRep.map(_._1).foreach(_ shouldBe 0.25 +- 1e-12)
    boolRep.map(_._2).toSeq shouldBe Seq(1, 0)
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
