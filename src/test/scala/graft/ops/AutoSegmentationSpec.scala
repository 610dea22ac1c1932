package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Pins the reference autosegmentation behaviors
  * (/root/reference/spark/python/whyspark/test_autosegmentation.py:41-80):
  * greedy picks with/without a target, segment-budget limits, and the
  * pinned simple-entropy values.
  */
class AutoSegmentationSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private lazy val dfA: DataFrame = {
    import spark.implicits._
    Seq(
      (8.6, "Orange", "Blue", "cat"),
      (31.0, "Brown", "Green", "dog"),
      (14.8, "White", "Black", "dog"),
      (15.2, "White", "Green", "cat"),
      (10.0, "Black", "Blue", "cat"),
      (9.1, "Orange", "Blue", "cat"))
      .toDF("weight_lbs", "color", "eye_color", "animal")
  }

  test("simple entropy pins the scipy-checked values") {
    AutoSegmentation.simpleEntropy(dfA, "animal") shouldBe 0.9182958340544896 +- 1e-9
    AutoSegmentation.simpleEntropy(dfA, "color") shouldBe 1.9182958340544893 +- 1e-9
    AutoSegmentation.simpleEntropy(dfA, "eye_color") shouldBe 1.4591479170272448 +- 1e-9
  }

  test("greedy with target picks eye_color and color") {
    AutoSegmentation.estimateSegments(dfA, Some("animal"))
      .toSet shouldBe Set("eye_color", "color")
  }

  test("greedy with tight budget picks only eye_color") {
    AutoSegmentation.estimateSegments(dfA, Some("animal"), maxSegments = 5)
      .toSet shouldBe Set("eye_color")
  }

  test("max_segments=2 leaves no room for any pick") {
    AutoSegmentation.estimateSegments(dfA, Some("animal"), maxSegments = 2)
      .toSet shouldBe Set.empty[String]
  }

  test("high-unique-percentage columns are filtered out") {
    // unique bound 0.5: color has 4/6 uniques (0.67) -> filtered
    val segs = AutoSegmentation.estimateSegments(dfA, Some("animal"),
      uniquePercUpper = 0.5)
    segs should not contain "color"
  }

  test("no string candidates yields empty result") {
    import spark.implicits._
    val numeric = Seq((1, 2.0), (2, 3.0)).toDF("a", "b")
    AutoSegmentation.estimateSegments(numeric, None) shouldBe Seq.empty
  }

  test("picked segments are in greedy gain order on events") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$sfDir/events.parquet").select(
      col("event_type").as("etype"),
      floor(col("value") / 100).cast("int").cast("string").as("vb"),
      pmod(col("user_id"), lit(4)).cast("string").as("ub"))
    val segs = AutoSegmentation.estimateSegments(ev, Some("etype"))
    segs should have size 2
    segs.toSet shouldBe Set("vb", "ub")
  }
}
