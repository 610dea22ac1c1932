package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** CUSUM change-point screen and corpus snapshot diff: recursion ==
  * closed form, alarm on a planted shift, degenerate series, and
  * hand-counted diffs.
  */
class CusumDiffSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("cusum closed form equals the textbook recursion on a planted " +
    "level shift; the shift alarms, the stable head does not") {
    import spark.implicits._
    // 20 points at 10, then 10 points at 14 (shift of ~2 sigma)
    val vals = Seq.fill(20)(10.0) ++ Seq.fill(10)(14.0)
    val df = vals.zipWithIndex.map { case (v, i) =>
      ("m", i.toLong, v)
    }.toDF("metric", "t", "v")
    val out = Drift.cusum(df, Seq("metric"), "t", "v", k = 0.5, h = 4.0)
      .orderBy(col("t")).collect()
    // reference recursion in plain Scala
    val mu = vals.sum / vals.size
    val sd = math.sqrt(
      vals.map(x => (x - mu) * (x - mu)).sum / (vals.size - 1))
    var sp = 0.0
    var sn = 0.0
    vals.zipWithIndex.foreach { case (v, i) =>
      val z = (v - mu) / sd
      sp = math.max(0.0, sp + z - 0.5)
      sn = math.max(0.0, sn - z - 0.5)
      out(i).getDouble(4) shouldBe (sp +- 1e-9)
      out(i).getDouble(5) shouldBe (sn +- 1e-9)
    }
    out.take(20).foreach(_.getBoolean(6) shouldBe false)
    out.last.getBoolean(6) shouldBe true
  }

  test("cusum: degenerate series (constant, single-point) never alarm") {
    import spark.implicits._
    val df = (Seq.fill(5)(("a", 7.0)) :+ ("b", 3.0)).zipWithIndex
      .map { case ((m, v), i) => (m, i.toLong, v) }
      .toDF("metric", "t", "v")
    val out = Drift.cusum(df, Seq("metric"), "t", "v").collect()
    out.foreach { r =>
      r.getDouble(3) shouldBe (0.0 +- 1e-12) // z
      r.getBoolean(6) shouldBe false
    }
  }

  test("corpusDiff counts added/removed/changed/unchanged by hand") {
    import spark.implicits._
    val old = Seq((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"),
      (4L, "d", "s2")).toDF("id", "text", "src")
    val neu = Seq((2L, "b", "s1"), (3L, "CHANGED", "s2"),
      (4L, "d", "s9"), (5L, "e", "s3")).toDF("id", "text", "src")
    val r = Diagnostics.corpusDiff(old, neu, "id", Seq("text", "src"))
      .collect().head
    r.getLong(0) shouldBe 1L // added: 5
    r.getLong(1) shouldBe 1L // removed: 1
    r.getLong(2) shouldBe 2L // changed: 3 (text), 4 (src)
    r.getLong(3) shouldBe 1L // unchanged: 2
    r.getLong(4) shouldBe 4L
    r.getLong(5) shouldBe 4L
  }

  test("corpusDiff: identical frames report all-unchanged; null ids " +
    "drop") {
    import spark.implicits._
    val d = Seq((Some(1L), "a"), (Some(2L), "b"),
      (Option.empty[Long], "x")).toDF("id", "text")
    val r = Diagnostics.corpusDiff(d, d, "id", Seq("text"))
      .collect().head
    r.getLong(0) shouldBe 0L
    r.getLong(1) shouldBe 0L
    r.getLong(2) shouldBe 0L
    r.getLong(3) shouldBe 2L
  }
}
