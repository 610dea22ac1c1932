package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

class RetentionSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private val Day = 86400000000L // micros

  test("cohort triangle: first-day cohorts, per-offset distinct users") {
    import spark.implicits._
    // u1 cohorts day 0, active days 0/1/3 (two events on day 1 dedupe);
    // u2 cohorts day 1, active day 1 only; u3 cohorts day 1, back day 2
    val ev = Seq(
      (1L, 0L), (1L, Day + 1000L), (1L, Day + 2000L), (1L, 3 * Day),
      (2L, Day), (3L, Day + 5L), (3L, 2 * Day + 7L))
      .toDF("user_id", "t")
    val got = Retention.cohorts(ev, "user_id", "t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 2L, (1L, 1L) -> 1L)
  }

  test("timestamp columns and raw micros agree; partition-invariant") {
    import spark.implicits._
    val rows = (1 to 400).map { i =>
      ((i % 37).toLong, 1700000000000000L + (i % 11) * Day + i * 1234L)
    }
    val raw = rows.toDF("user_id", "t")
    val ts = raw.withColumn("t", timestamp_micros(col("t")))
    def norm(df: org.apache.spark.sql.DataFrame) =
      Retention.cohorts(df, "user_id", "t")
        .collect().map(_.toSeq).toSet
    val expect = norm(raw)
    norm(ts) shouldBe expect
    norm(ts.repartition(13)) shouldBe expect
    // offsets 0-based, every cohort has an offset-0 row
    expect.map(s => s(1).asInstanceOf[Long]).min shouldBe 0L
  }

  test("ltv curve: hand-computed cohorts, cumulative revenue, and " +
      "per-acquired-user division") {
    import spark.implicits._
    val day = 86400000000L
    // cohort 0: A (10 @ d0, 5 @ d1), B (20 @ d0); cohort 1: C (7 @ d1)
    val ev = Seq(
      ("A", 0L * day, 10.0), ("A", 1L * day, 5.0),
      ("B", 0L * day + 5L, 20.0),
      ("C", 1L * day + 9L, 7.0)).toDF("u", "t", "v")
    val got = Retention.ltvCurve(ev, "u", "t", "v")
      .select("cohort_day", "day_offset", "n_active", "cohort_users",
        "revenue", "cum_revenue", "ltv")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    got((0L, 0L)) shouldBe ((2L, 2L, 30.0, 30.0, 15.0))
    got((0L, 1L)) shouldBe ((1L, 2L, 5.0, 35.0, 17.5))
    got((1L, 0L)) shouldBe ((1L, 1L, 7.0, 7.0, 7.0))
    got.size shouldBe 3
  }
}
