package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Event-time normalization shared by every time-based operator
  * (sessionization, as-of joins, streaming fixtures). One rule, applied
  * by schema dispatch so callers never hand-write timestamp arithmetic:
  *
  *  - `TIMESTAMP` columns become exact epoch microseconds via
  *    `unix_micros` — integer math, ANSI-legal, no double rounding (a
  *    double holds epoch-micros only to 2^53).
  *  - `TIMESTAMP_NTZ` columns (what Spark 4 infers for parquet
  *    `isAdjustedToUTC=false`, e.g. the pandas-written testdata) are
  *    decomposed into date + time-of-day fields: `unix_micros` rejects
  *    NTZ, and casting to TIMESTAMP would interpret the wall clock in the
  *    SESSION timezone — under a DST-observing zone that shift is not
  *    constant, so intervals spanning a transition would distort. Field
  *    extraction is pure arithmetic and timezone-independent.
  *  - numeric columns (e.g. raw epoch-micros longs) pass through as-is.
  */
object EventTime {

  /** `df`'s `tsCol` as an exact micros-resolution LONG column (epoch
    * micros for instants, wall-clock micros for NTZ, identity for longs).
    */
  def micros(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampType => unix_micros(col(tsCol))
      case TimestampNTZType =>
        val ts = col(tsCol)
        unix_date(ts.cast(DateType)).cast("long") * lit(86400000000L) +
          date_part(lit("HOUR"), ts).cast("long") * lit(3600000000L) +
          date_part(lit("MINUTE"), ts).cast("long") * lit(60000000L) +
          (date_part(lit("SECOND"), ts).cast("decimal(16,6)") *
            lit(1000000)).cast("long")
      case _ => col(tsCol).cast("long")
    }

  /** `df`'s `tsCol` as a DOUBLE for range probing and bucket math:
    * epoch SECONDS (micro-precision) for timestamp types — the unit the
    * legacy `cast("double")` gave, so bucket widths stay in seconds — and
    * a plain double cast for numeric time columns. Distinct micros stay
    * distinct (double resolution at epoch-seconds magnitude is ~0.24 us),
    * so ordering and tie-breaks are preserved.
    */
  def seconds(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampType | TimestampNTZType =>
        micros(df, tsCol).cast("double") / lit(1e6)
      case _ => col(tsCol).cast("double")
    }
}
