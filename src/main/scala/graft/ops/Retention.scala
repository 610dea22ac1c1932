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
}
