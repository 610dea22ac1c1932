package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Curation funnel: hand-counted staged attrition, ordered-stage
  * semantics (a stage only sees survivors of previous ones), NULL
  * conditions failing, and the one-scan plan.
  */
class CurationFunnelSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {
  import spark.implicits._

  private val df = Seq(
    // (group, len, score): stage1 = len >= 3, stage2 = score > 0
    ("a", 5, 1.0), ("a", 4, -1.0), ("a", 2, 9.0), ("a", 3, 0.5),
    ("b", 1, 1.0), ("b", 9, java.lang.Double.NaN))
    .toDF("g", "len", "score")
    .withColumn("score", when(col("score").isNaN, lit(null)
      .cast("double")).otherwise(col("score")))

  test("hand-counted attrition; later stages only see survivors; " +
      "NULL conditions fail") {
    val got = Curation.funnelReport(df, "g", Seq(
      "long_enough" -> (col("len") >= 3),
      "positive" -> (col("score") > 0)))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    got(("a", 1)) shouldBe (("long_enough", 4L, 3L))
    got(("a", 2)) shouldBe (("positive", 3L, 2L)) // the -1.0 row drops
    got(("b", 1)) shouldBe (("long_enough", 2L, 1L))
    got(("b", 2)) shouldBe (("positive", 1L, 0L)) // NULL score fails
    got.size shouldBe 4
  }

  test("keep_rate is n_out/n_in, NULL when nothing enters the stage") {
    val got = Curation.funnelReport(df, "g", Seq(
      "none" -> lit(false), "next" -> lit(true)))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        Option(r.get(5)).map(_.asInstanceOf[Double])).toMap
    got(("a", 1)) shouldBe Some(0.0)
    got(("a", 2)) shouldBe None // 0 entered -> undefined rate
  }

  test("one corpus scan: a single hash exchange feeds the whole funnel") {
    val plan = Curation.funnelReport(df, "g", Seq(
      "s1" -> (col("len") >= 3), "s2" -> (col("score") > 0)))
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
  }

  test("empty stage list is rejected") {
    intercept[IllegalArgumentException] {
      Curation.funnelReport(df, "g", Nil)
    }
  }
}
