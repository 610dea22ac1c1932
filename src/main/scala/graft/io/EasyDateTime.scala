package graft.io

import java.time.{Instant, LocalDate, LocalDateTime, LocalTime, MonthDay, Year, YearMonth, ZoneOffset, ZonedDateTime}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoField
import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Lenient date/time parsing with temporal-class inference — the semantics
  * of the reference's EasyDateTimeParser
  * (/root/reference/core/src/main/java/com/whylogs/core/datetime/EasyDateTimeParser.java:18-84,
  * DateTimeFormatParser.java:40-130), re-expressed as a stateless Catalyst
  * expression over StringType -> TimestampType (UTC):
  *
  *  - format "epoch" / "epochMillis": the string is an epoch-seconds /
  *    epoch-millis long;
  *  - any other format: a DateTimeFormatter pattern; WHICH temporal class
  *    it denotes (Year / YearMonth / MonthDay / LocalDate / LocalTime /
  *    LocalDateTime / ZonedDateTime) is inferred from the fields the parse
  *    supports, exactly the reference's decision tree — partial dates
  *    resolve to the period start (Jan 1 / day 1 / midnight, UTC);
  *  - null / "" / "nan" / "null" (case-insensitive) -> epoch 0, NOT null
  *    (the reference's BEGINNING_OF_TIME sentinel).
  *
  * Statelessness: the reference caches the inferred parser from the first
  * value; here inference runs per value (same result on every row of a
  * well-formed column, no cross-partition state, deterministic under any
  * partitioning). MonthDay uses the reference's Year.now() semantics
  * replaced by a fixed year via `monthDayYear` (driver-deterministic).
  */
case class EasyDateTime(
    child: Expression,
    format: String,
    monthDayYear: Int = 1970)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = false
  override def prettyName: String = "easy_datetime"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"easy_datetime requires string, got $t")
  }

  @transient private lazy val formatter: DateTimeFormatter =
    if (isEpoch) null
    else DateTimeFormatter.ofPattern(format).withLocale(Locale.ENGLISH)

  private def isEpoch: Boolean =
    format.equalsIgnoreCase("epoch") || format.equalsIgnoreCase("epochMillis")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val s = if (v == null) null else v.asInstanceOf[UTF8String].toString
    toMicros(s)
  }

  private[io] def toMicros(s: String): Long = {
    if (s == null || s.isEmpty ||
        s.equalsIgnoreCase("nan") || s.equalsIgnoreCase("null"))
      return 0L // BEGINNING_OF_TIME
    val instant: Instant =
      if (format.equalsIgnoreCase("epoch")) Instant.ofEpochSecond(s.toLong)
      else if (format.equalsIgnoreCase("epochMillis")) Instant.ofEpochMilli(s.toLong)
      else {
        // ONE parse per value: the temporal-class routing below reads the
        // already-parsed accessor (isSupported bit checks + X.from(...)),
        // never re-parses the string — the r15 review flagged the old
        // LocalDate.parse(s, formatter) routes as a per-row double parse.
        // Inference still runs per value (cheap field checks), keeping the
        // expression stateless and deterministic under any partitioning
        // where the reference caches a parser after the first value.
        val parsed = formatter.parse(s)
        val hasYear = parsed.isSupported(ChronoField.YEAR)
        val hasMonth = parsed.isSupported(ChronoField.MONTH_OF_YEAR)
        val hasDay = parsed.isSupported(ChronoField.DAY_OF_MONTH)
        val hasHour = parsed.isSupported(ChronoField.HOUR_OF_DAY)
        if (hasHour && hasYear && hasMonth && hasDay) {
          if (formatter.getZone != null || parsed.isSupported(ChronoField.OFFSET_SECONDS))
            ZonedDateTime.from(parsed).toInstant
          else LocalDateTime.from(parsed).atZone(ZoneOffset.UTC).toInstant
        } else if (hasHour && !hasYear && !hasMonth && !hasDay) {
          LocalTime.from(parsed)
            .atDate(LocalDate.ofEpochDay(0)).atZone(ZoneOffset.UTC).toInstant
        } else if (hasYear && hasMonth && hasDay) {
          LocalDate.from(parsed).atStartOfDay(ZoneOffset.UTC).toInstant
        } else if (!hasYear && hasMonth && hasDay) {
          MonthDay.from(parsed).atYear(monthDayYear)
            .atStartOfDay.atZone(ZoneOffset.UTC).toInstant
        } else if (hasYear && hasMonth) {
          YearMonth.from(parsed).atDay(1)
            .atStartOfDay.atZone(ZoneOffset.UTC).toInstant
        } else if (hasYear) {
          Year.from(parsed).atMonth(1).atDay(1)
            .atStartOfDay.atZone(ZoneOffset.UTC).toInstant
        } else {
          throw new IllegalArgumentException(
            s"format '$format' matches no supported temporal class")
        }
      }
    Math.addExact(Math.multiplyExact(instant.getEpochSecond, 1000000L),
      instant.getNano / 1000L)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
