package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.profile.ProfileSession.ProfilingOps

/** ModelProfileMessage wire form (field 10 of DatasetProfileMessage):
  * classification score matrices and regression error sums ride the
  * exported profile binary and parse back exactly
  * (ModelProfile.java:36-62, ClassificationMetrics.java:207-252,
  * RegressionMetrics.java:70-97).
  */
class ModelProtoSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("regression metrics ride the wire profile and parse back exactly") {
    import spark.implicits._
    val df = Seq((1.0, 1.5), (2.0, 1.0), (3.0, 3.25))
      .toDF("pred", "actual")
    val bytes = df.newProfilingSession("reg")
      .withRegressionModel("pred", "actual")
      .exportProto()
      .select(col("why_profile")).collect().head.getAs[Array[Byte]](0)

    val parsed = ProfileProto.parseModelProfile(bytes)
    parsed shouldBe defined
    val r = parsed.get.asInstanceOf[ProfileProto.RegressionProto]
    r.predictionField shouldBe "pred"
    r.targetField shouldBe "actual"
    r.count shouldBe 3L
    // diffs: -0.5, 1.0, -0.25
    r.sumAbsDiff shouldBe (1.75 +- 1e-12)
    r.sumDiff shouldBe (0.25 +- 1e-12)
    r.sum2Diff shouldBe (0.25 + 1.0 + 0.0625 +- 1e-12)
  }

  test("classification score matrix rides the wire profile, cells exact") {
    import spark.implicits._
    val df = Seq(
      ("cat", "cat", 0.9), ("cat", "dog", 0.6),
      ("dog", "dog", 0.8), ("dog", "dog", 0.7), ("dog", "cat", 0.4))
      .toDF("pred", "actual", "score")
    val bytes = df.newProfilingSession("clf")
      .withClassificationModel("pred", "actual", Some("score"))
      .exportProto()
      .select(col("why_profile")).collect().head.getAs[Array[Byte]](0)

    val parsed = ProfileProto.parseModelProfile(bytes)
    parsed shouldBe defined
    val c = parsed.get.asInstanceOf[ProfileProto.ClassificationProto]
    c.labels shouldBe Seq("cat", "dog")
    c.predictionField shouldBe "pred"
    c.targetField shouldBe "actual"
    c.scoreField shouldBe "score"
    // (prediction, target) -> (count, score sum)
    c.cells(("cat", "cat")).count shouldBe 1L
    c.cells(("cat", "dog")).count shouldBe 1L
    c.cells(("dog", "dog")).count shouldBe 2L
    c.cells(("dog", "dog")).sum shouldBe (1.5 +- 1e-12)
    c.cells(("dog", "cat")).count shouldBe 1L
    c.cells(("dog", "cat")).mean shouldBe (0.4 +- 1e-12)
  }

  test("no model configured -> no field-10 message on the wire") {
    import spark.implicits._
    val bytes = Seq(("a", 1.0)).toDF("k", "v")
      .newProfilingSession().exportProto()
      .select(col("why_profile")).collect().head.getAs[Array[Byte]](0)
    ProfileProto.parseModelProfile(bytes) shouldBe None
  }

  test("direct writer/reader round trip preserves classification variance") {
    val m = new graft.metrics.Moments
    Seq(0.2, 0.4, 0.9).foreach(m.update)
    val clf = ProfileProto.ClassificationProto(Seq("0", "1"),
      "p", "t", "s", Map(("0", "1") -> m))
    val bytes = ProfileProto.toBytes(
      ProfileProto.DatasetProfile("s", 1L, None, Map.empty, Map.empty,
        Map.empty),
      Some(clf))
    val back = ProfileProto.parseModelProfile(bytes).get
      .asInstanceOf[ProfileProto.ClassificationProto]
    val cell = back.cells(("0", "1"))
    cell.count shouldBe 3L
    cell.mean shouldBe (m.mean +- 1e-12)
    cell.m2 shouldBe (m.m2 +- 1e-12)
    cell.min shouldBe 0.2
    cell.max shouldBe 0.9
  }
}
