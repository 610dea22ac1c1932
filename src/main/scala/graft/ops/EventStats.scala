package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-decayed per-key event statistics — the recency-weighted
  * activity scores behind engagement ranking and freshness-aware
  * sampling: each event contributes `value * 2^(-(age / half_life))`,
  * where age is measured back from the KEY'S OWN most recent event, so
  * the score is replay-stable (no wall-clock `now` in the formula —
  * the same events always produce the same score).
  *
  * Scale shape: the per-key max-time pass is a window aggregate over
  * the same hash partitioning the final groupBy needs — Catalyst
  * reuses the exchange, so the events shuffle ONCE; the decay weights
  * are a map-side projection and the score is one map-side-combined
  * aggregate. No sort: max-over-partition and sum need no ordering.
  */
object EventStats {

  /** Per-key decayed score over events: one row per key with
    * `ewma_score = sum(value * 2^((t - max_t) / half_life))`,
    * `n_events`, and `last_t` (epoch micros). `halfLifeSeconds` is
    * the age at which an event's contribution halves. Events with a
    * NULL value contribute nothing (their time still anchors
    * recency).
    */
  def decayedScore(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      halfLifeSeconds: Double): DataFrame = {
    require(halfLifeSeconds > 0,
      s"halfLifeSeconds must be > 0, got $halfLifeSeconds")
    val t = EventTime.micros(df, tsCol)
    val w = Window.partitionBy(col(keyCol))
    val withT = df.select(col(keyCol), t.as("__t"),
      col(valueCol).cast("double").as("__v"))
      .withColumn("__maxt", max(col("__t")).over(w))
    withT
      .groupBy(col(keyCol))
      .agg(
        sum(coalesce(col("__v"), lit(0.0)) *
          pow(lit(2.0), (col("__t") - col("__maxt")).cast("double") /
            lit(halfLifeSeconds * 1e6))).as("ewma_score"),
        count(lit(1)).as("n_events"),
        max(col("__t")).as("last_t"))
  }

  /** Decayed EVENT COUNT per key (every event weighs 1): the
    * recency-weighted activity level. Same plan shape as
    * [[decayedScore]].
    */
  def decayedCount(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      halfLifeSeconds: Double): DataFrame =
    decayedScore(df.withColumn("__one", lit(1.0)), keyCol, tsCol,
      "__one", halfLifeSeconds)
      .withColumnRenamed("ewma_score", "decayed_count")
}
