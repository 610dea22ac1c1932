package graft.io

import java.time.Instant

import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the reference EasyDateTimeParser behaviors
  * (/root/reference/core/src/test/java/com/whylogs/core/datetime/EasyDateTimeParserTest.java,
  * EasyDateTimeParser.java:18-84): epoch/epochMillis formats, temporal-class
  * inference per pattern, nan/null/empty -> epoch 0.
  */
class EasyDateTimeSpec extends AnyFunSuite with Matchers {

  private def micros(format: String, s: String): Long =
    EasyDateTime(Literal("x"), format).toMicros(s)

  private def instant(format: String, s: String): Instant = {
    val us = micros(format, s)
    Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
  }

  test("epoch seconds format") {
    micros("epoch", "1608772592") shouldBe 1608772592L * 1000000L
    micros("EPOCH", "0") shouldBe 0L
  }

  test("epochMillis format") {
    micros("epochMillis", "1608772592814") shouldBe 1608772592814L * 1000L
  }

  test("null, empty, nan, NULL strings parse to epoch 0") {
    micros("yyyy-MM-dd", null) shouldBe 0L
    micros("yyyy-MM-dd", "") shouldBe 0L
    micros("yyyy-MM-dd", "nan") shouldBe 0L
    micros("yyyy-MM-dd", "NaN") shouldBe 0L
    micros("yyyy-MM-dd", "null") shouldBe 0L
    micros("yyyy-MM-dd", "NULL") shouldBe 0L
  }

  test("LocalDate pattern -> start of day UTC") {
    instant("yyyy-MM-dd", "2020-12-23") shouldBe Instant.parse("2020-12-23T00:00:00Z")
    instant("MM/dd/yyyy", "12/23/2020") shouldBe Instant.parse("2020-12-23T00:00:00Z")
  }

  test("LocalDateTime pattern") {
    instant("yyyy-MM-dd HH:mm:ss", "2020-12-23 10:30:05") shouldBe
      Instant.parse("2020-12-23T10:30:05Z")
  }

  test("zoned pattern uses the embedded offset") {
    instant("yyyy-MM-dd HH:mm:ssXXX", "2020-12-23 10:30:05+02:00") shouldBe
      Instant.parse("2020-12-23T08:30:05Z")
  }

  test("YearMonth pattern -> first day of month") {
    instant("yyyy-MM", "2020-12") shouldBe Instant.parse("2020-12-01T00:00:00Z")
  }

  test("Year pattern -> January 1") {
    instant("yyyy", "2020") shouldBe Instant.parse("2020-01-01T00:00:00Z")
  }

  test("MonthDay pattern -> deterministic fixed year") {
    instant("MM-dd", "03-15") shouldBe Instant.parse("1970-03-15T00:00:00Z")
  }

  test("LocalTime pattern -> epoch day") {
    instant("HH:mm:ss", "10:30:05") shouldBe Instant.parse("1970-01-01T10:30:05Z")
  }

  test("unparseable input raises") {
    an[Exception] should be thrownBy micros("yyyy-MM-dd", "not-a-date")
  }
}
