package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sessionization under Structured Streaming via Spark's native
  * `session_window`: the state store keeps ONE entry per open session
  * (merged as events arrive, closed by the watermark in append mode), so
  * state is bounded by concurrent open sessions — not stream length.
  *
  * This is the streaming twin of [[graft.ops.Sessionize]]; the batch
  * operator's session stats converge to the same rows for the same
  * events. One boundary difference by construction: `session_window`
  * extends a session over the half-open interval [ts, ts+gap), so an
  * event at EXACTLY ts+gap starts a new session, while the batch
  * operator's `diff > gap` test keeps it in the old one — at-boundary
  * events are measure-zero for real (continuous-time) streams.
  */
object StreamingSessions {

  /** Per-(user, session) stats over a streaming DataFrame with an
    * event-time column. In production use append mode + a watermark so
    * closed sessions emit exactly once and state is evicted; with no
    * watermark, run complete/update mode (tests, bounded replays).
    */
  def sessionStats(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      gap: String,
      watermark: Option[String] = None): DataFrame = {
    val marked = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    marked
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("session"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_t"),
        max(unix_micros(col(tsCol))).as("end_t"))
      .withColumn("duration_t", col("end_t") - col("start_t"))
      .select(col(userCol), col("session.start").as("session_start"),
        col("n_events"), col("start_t"), col("end_t"), col("duration_t"))
  }
}
