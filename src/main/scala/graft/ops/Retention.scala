package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: users cohort by the epoch day
  * of their first event, and each (cohort day, day offset) row counts
  * the distinct users active exactly `offset` days after their cohort
  * day — the classic retention triangle, completing the behavioral
  * trio with [[Sessionize]] and [[Funnel]].
  *
  * Plan shape: (1) the (user, day) distinct — the only exchange that
  * carries event-scale data, and it carries 16-byte pairs, not rows;
  * (2) a per-user window min over the already-distinct pairs (one
  * re-exchange of the day-deduped pairs on the user key); (3) the final
  * (cohort, offset) count over rows already unique per user — bounded
  * by users x active days. No collect, no per-user state.
  */
object Retention {

  /** Per-(cohort_day, day_offset) distinct active users. Days are
    * floor(epoch micros / 86_400_000_000) — calendar-free UTC day
    * buckets, exact integer arithmetic via [[EventTime.micros]].
    */
  def cohorts(
      df: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val day = floor(EventTime.micros(df, tsCol)
      .cast("double") / lit(86400000000.0)).cast("long")
    val active = df.select(col(userCol).as("__u"), day.as("__day"))
      .distinct()
    val w = Window.partitionBy(col("__u"))
    val withFirst = active.withColumn("__first", min(col("__day")).over(w))
    withFirst
      .groupBy(col("__first").as("cohort_day"),
        (col("__day") - col("__first")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Cohort LTV curve — cumulative revenue per acquired user by
    * cohort age, the monetized companion to [[cohorts]]: users group
    * by their first-active day, revenue accumulates over day offsets,
    * and `ltv` divides by the COHORT size (every user is active on
    * their own first day, so cohort size is exactly the distinct-user
    * count at offset 0 — read back via a window, no second pass over
    * the events). One events-scale aggregate + cohort-sized windows.
    * Output: cohort_day, day_offset, n_active, cohort_users, revenue,
    * cum_revenue, ltv.
    */
  def ltvCurve(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      valueCol: String): DataFrame = {
    val day = floor(EventTime.micros(df, tsCol)
      .cast("double") / lit(86400000000.0)).cast("long")
    val ev = df.select(col(userCol).as("__u"), day.as("__day"),
      col(valueCol).cast("double").as("__v"))
    val w = Window.partitionBy(col("__u"))
    val withFirst = ev.withColumn("__first", min(col("__day")).over(w))
    val cells = withFirst
      .groupBy(col("__first").as("cohort_day"),
        (col("__day") - col("__first")).as("day_offset"))
      .agg(count_distinct(col("__u")).as("n_active"),
        sum(col("__v")).as("revenue"))
    val wCohort = Window.partitionBy(col("cohort_day"))
    val wCum = Window.partitionBy(col("cohort_day"))
      .orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cohort_users",
        max(when(col("day_offset") === 0, col("n_active"))).over(wCohort))
      .withColumn("cum_revenue", sum(col("revenue")).over(wCum))
      .withColumn("ltv", col("cum_revenue") / col("cohort_users"))
  }
}
