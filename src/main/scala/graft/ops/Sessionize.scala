package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of event streams: a session is a maximal run
  * of a user's events where consecutive gaps stay within `gap` time units.
  * The standard behavioral-analytics operator over the `events` table.
  *
  * Scale shape: ONE shuffle on the user key (the window partition); the
  * session assignment is two window passes over the same sorted partition
  * (lag + running sum — Spark plans them in a single WindowExec), and
  * [[stats]]' aggregation groups by (user, session), which hash-partitions
  * to the same executors the window pass already used.
  *
  * Time arithmetic is exact integer math in the column's native
  * resolution: TIMESTAMP columns compare as epoch microseconds
  * (`unix_micros`), numeric columns (e.g. raw epoch-nanos longs) compare
  * as-is — `gap` is in that same unit.
  */
object Sessionize {

  private def timeUnits(df: DataFrame, tsCol: String): Column =
    EventTime.micros(df, tsCol)

  /** Adds `session_seq` (1-based per user, time-ordered): a new session
    * starts at the user's first event and whenever the gap since the
    * previous event exceeds `gap` (native time units).
    */
  def assign(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gap: Long): DataFrame = {
    val units = timeUnits(df, tsCol)
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(units, 1).over(w)
    val isNew = when(prev.isNull || units - prev > gap, 1L).otherwise(0L)
    df.withColumn("session_seq", sum(isNew).over(run))
  }

  /** Per-(user, session) stats: event count, start/end/duration in the
    * time column's native units.
    */
  def stats(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gap: Long): DataFrame = {
    val units = timeUnits(df, tsCol)
    assign(df, userCol, tsCol, gap)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(units).as("start_t"),
        max(units).as("end_t"))
      .withColumn("duration_t", col("end_t") - col("start_t"))
  }
}
