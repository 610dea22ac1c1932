package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.metrics.ProfileConfig
import graft.profile.ProfileSession

/** Profiling under Structured Streaming (SURVEY build-plan layer 7): the
  * same per-column profile aggregates run under
  * `groupBy(window(ts, cadence), keys)` with a watermark — late data folds
  * in through the aggregate's merge, exactly the mergeability the batch
  * engine already proves. State per group is the compact sketch buffer
  * (KBs), so state-store size is groups x columns x KBs, independent of
  * stream length.
  *
  * The reference has no streaming engine; its designed hook is profile
  * mergeability across batches (DatasetProfile.java:241-250). The
  * store-and-merge sink below is that hook: each micro-batch appends its
  * profile rows to a parquet store, and [[mergeStored]] re-aggregates the
  * store down to one profile per (keys x window) whenever queried.
  */
object StreamingProfile {

  /** Windowed streaming profiles: one row per (window x keys) per trigger.
    * `df` must be a streaming DataFrame with an event-time column.
    */
  def windowedProfiles(
      df: DataFrame,
      timeColumn: String,
      cadence: String,
      watermark: String,
      keys: Seq[String] = Nil,
      cfg: ProfileConfig = ProfileConfig.default): DataFrame = {
    val marked = df.withWatermark(timeColumn, watermark)
    val session = ProfileSession(marked, groupKeys = keys,
      timeColumn = Some((timeColumn, cadence)), cfg = cfg)
    session.aggProfiles()
  }

  /** Store-and-merge sink over the RAW stream: each micro-batch is
    * profiled independently (plain batch aggregation inside foreachBatch —
    * no cross-batch state) and its partial profiles written to a
    * `batch=<id>` subdirectory of the parquet store (overwrite, so
    * at-least-once replay of a batch is idempotent);
    * [[mergeStored]] merges the partials on read. This is the
    * pattern for unbounded retention: the state store never grows, and the
    * stored partials re-aggregate to exactly the all-data profile because
    * the profile is a commutative monoid.
    *
    * (A stateful-aggregation variant must NOT be appended per trigger:
    * update-mode emissions carry cumulative group state, so storing every
    * emission would double-count earlier batches.)
    */
  def perBatchProfileSink(
      df: DataFrame,
      storePath: String,
      keys: Seq[String] = Nil,
      timeColumn: Option[(String, String)] = None,
      cfg: ProfileConfig = ProfileConfig.default): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        storeBatchProfiles(batch, batchId, storePath, keys, timeColumn, cfg)
      }

  /** The foreachBatch body of [[perBatchProfileSink]], exposed so replay
    * idempotency is directly testable: foreachBatch is at-least-once, and
    * invoking this twice with the same batchId leaves the store unchanged
    * (the batch overwrites its own batchId-keyed subdirectory).
    */
  def storeBatchProfiles(
      batch: DataFrame,
      batchId: Long,
      storePath: String,
      keys: Seq[String] = Nil,
      timeColumn: Option[(String, String)] = None,
      cfg: ProfileConfig = ProfileConfig.default): Unit =
    if (!batch.isEmpty) {
      ProfileSession(batch, groupKeys = keys, timeColumn = timeColumn,
        cfg = cfg).aggProfiles()
        .write.mode("overwrite").parquet(s"$storePath/batch=$batchId")
    }

  /** Re-aggregate the profile store down to one profile per group — the
    * cross-batch merge (same monoid as the batch engine's mergeProfiles).
    */
  def mergeStored(spark: SparkSession, storePath: String,
      keys: Seq[String]): DataFrame =
    ProfileSession.mergeProfiles(
      spark.read.parquet(storePath).drop("batch"), keys)

  /** Continuous metric-anomaly screen — the streaming completion of
    * [[graft.ops.Drift.metricAnomalies]], whose cross-WINDOW aggregate
    * (each window's mean z-scored against all windows) cannot run as a
    * single stateful streaming plan. The intended pattern is foreachBatch
    * over the profile store: each trigger writes the batch's windowed
    * partial profiles to a batchId-keyed subdirectory of `storePath`
    * (the [[perBatchProfileSink]] monoid; overwrite ⇒ replay-idempotent),
    * merges the accumulated store per (keys, window), and re-scores the
    * whole time series, overwriting `screenPath`.
    *
    * The screen is overwritten (not appended) by design: z-scores are
    * relative to ALL windows seen so far, so earlier windows' rows
    * legitimately change as history accumulates. The re-score cost is
    * proportional to windows x columns (profile rows, not data rows) —
    * at any corpus scale the trigger-time work beyond the batch profile
    * is a small-frame aggregate plus a broadcast join.
    */
  def anomalyScreenSink(
      df: DataFrame,
      storePath: String,
      screenPath: String,
      cols: Seq[String],
      timeColumn: (String, String),
      keys: Seq[String] = Nil,
      threshold: Double = 3.0,
      cfg: ProfileConfig = ProfileConfig.default): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        screenBatch(batch, batchId, storePath, screenPath, cols,
          timeColumn, keys, threshold, cfg)
      }

  /** The foreachBatch body of [[anomalyScreenSink]], exposed so replay
    * idempotency is directly testable: invoking it twice with the same
    * batchId leaves both the store and the recomputed screen unchanged
    * (the batch overwrites its own batchId-keyed store subdirectory, and
    * the screen is a pure function of the store).
    */
  def screenBatch(
      batch: DataFrame,
      batchId: Long,
      storePath: String,
      screenPath: String,
      cols: Seq[String],
      timeColumn: (String, String),
      keys: Seq[String] = Nil,
      threshold: Double = 3.0,
      cfg: ProfileConfig = ProfileConfig.default): Unit =
    if (!batch.isEmpty) {
      val spark = batch.sparkSession
      ProfileSession(batch, groupKeys = keys,
        timeColumn = Some(timeColumn), cfg = cfg).aggProfiles()
        .write.mode("overwrite").parquet(s"$storePath/batch=$batchId")
      val merged = ProfileSession.mergeProfiles(
        spark.read.parquet(storePath).drop("batch"), keys :+ "window")
      graft.ops.Drift.metricAnomalies(merged, cols,
        keep = keys :+ "window", threshold = threshold)
        .write.mode("overwrite").parquet(screenPath)
    }

  /** Continuous-upload sink: each micro-batch is profiled and its
    * profile rows POSTed from executors via [[graft.io.ProfileUpload]]
    * (retry/backoff per row) — the streaming equivalent of the
    * reference's `log()` upload path (WhyLogs.scala:179-190), one
    * monitoring push per trigger. Upload failure fails the batch, so
    * the stream's checkpoint retries it — no silent gaps in the
    * monitoring feed.
    */
  def uploadSink(
      df: DataFrame,
      endpoint: String,
      apiKey: String,
      keys: Seq[String] = Nil,
      timeColumn: Option[(String, String)] = None,
      sessionId: String = "graft-stream",
      retry: graft.io.ProfileUpload.RetryConfig =
        graft.io.ProfileUpload.RetryConfig(),
      cfg: ProfileConfig = ProfileConfig.default): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val profiles = ProfileSession(batch, groupKeys = keys,
            timeColumn = timeColumn, cfg = cfg).aggProfiles()
          graft.io.ProfileUpload.upload(profiles, endpoint, apiKey,
            sessionId = s"$sessionId-$batchId", retry = retry)
        }
      }
}
