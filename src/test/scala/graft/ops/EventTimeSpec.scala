package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** EventTime is the single source of truth for event-time arithmetic
  * (sessionize, as-of joins, the driver's streaming fixtures); pin its
  * dispatch exactly so a regression shows up here, not as six driver
  * queries silently falling off the board.
  */
class EventTimeSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private val micros = Seq(0L, 1L, 999999L, 1700000000000001L,
    -1000001L) // pre-epoch too: floor semantics, not truncation

  test("micros: TIMESTAMP and TIMESTAMP_NTZ recover the exact input " +
    "micros; longs pass through") {
    import spark.implicits._
    val df = micros.toDF("us")
    for (t <- Seq("timestamp", "timestamp_ntz")) {
      val typed = df.withColumn("ts", timestamp_micros(col("us")).cast(t))
      val got = typed.select(col("us"),
          EventTime.micros(typed, "ts").as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      got.foreach { case (in, out) =>
        withClue(s"$t at $in: ") { out shouldBe in }
      }
    }
    val raw = df.select(col("us"), EventTime.micros(df, "us").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    raw.foreach { case (in, out) => out shouldBe in }
  }

  test("seconds: micro-adjacent instants stay distinct and ordered " +
    "(double resolution at epoch scale is finer than 1 us)") {
    import spark.implicits._
    val df = Seq(1700000000000000L, 1700000000000001L,
        1700000000000002L).toDF("us")
      .withColumn("ts", timestamp_micros(col("us")))
    val secs = df.select(EventTime.seconds(df, "ts")).collect()
      .map(_.getDouble(0))
    secs.distinct.length shouldBe 3
    secs.sorted shouldBe secs
  }

  test("seconds on a numeric column is the plain double value " +
    "(bucket widths keep their documented units)") {
    import spark.implicits._
    val df = Seq(3600L, 7200L).toDF("t")
    df.select(EventTime.seconds(df, "t")).collect()
      .map(_.getDouble(0)) shouldBe Array(3600.0, 7200.0)
  }
}
