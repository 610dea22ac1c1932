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
    *
    * Compaction-aware: when [[compactStore]] has produced checkpoint
    * directories (`batch=compact_<id>`), the read uses the HIGHEST
    * COMPLETE checkpoint (parquet `_SUCCESS` marker — a crashed
    * compaction leaves no marker and is ignored) plus every per-trigger
    * directory with batchId > id. Per-trigger directories at or below a
    * complete checkpoint are redundant by construction and excluded, so
    * a crash anywhere in compact-then-vacuum never double-counts or
    * loses data.
    */
  def mergeStored(spark: SparkSession, storePath: String,
      keys: Seq[String]): DataFrame =
    ProfileSession.mergeProfiles(readStored(spark, storePath), keys)

  /** The store's current LIVE partial-profile rows (checkpoint-aware, see
    * [[mergeStored]]), without the `batch` partition column.
    */
  def readStored(spark: SparkSession, storePath: String): DataFrame = {
    val (ckpt, liveBatches) = storeParts(storePath)
    val paths = ckpt.map(_._2).toSeq ++ liveBatches.map(_._2)
    require(paths.nonEmpty, s"profile store $storePath is empty")
    spark.read.parquet(paths: _*)
  }

  /** Fold every per-trigger directory with batchId <= `upToBatchId`
    * (plus the previous checkpoint, if any) into ONE checkpoint
    * directory `batch=compact_<upToBatchId>`. The store stays a valid
    * partial set throughout: the checkpoint holds the same monoid rows
    * (one partial profile per group), so [[mergeStored]] before, during,
    * and after compaction returns the same result — the write is
    * invisible until its `_SUCCESS` marker lands (readers gate on it),
    * and the consumed directories stay on disk until [[vacuumStore]].
    * Unbounded retention cost drops from O(triggers) directories to
    * O(1) + directories since the last compaction.
    */
  def compactStore(spark: SparkSession, storePath: String,
      upToBatchId: Long): Unit = {
    val (ckpt, liveBatches) = storeParts(storePath)
    val newBatches = liveBatches.filter(_._1 <= upToBatchId)
    // Non-advancing call (upToBatchId == the current complete checkpoint,
    // no newer trigger dirs): the write target would be the checkpoint
    // directory being READ, and mode(overwrite) onto a read path is
    // committer/version-dependent (post-vacuum that checkpoint is the
    // only copy). Nothing new to fold — no-op.
    if (newBatches.isEmpty && ckpt.exists(_._1 == upToBatchId)) return
    val consumed = newBatches.map(_._2) ++
      ckpt.filter(_._1 <= upToBatchId).map(_._2)
    if (consumed.isEmpty) return
    // merge back to the finest stored grouping: every non-profile
    // column (keys and/or window) keys the merge, so the checkpoint
    // rows stay PARTIALS at the store's own granularity
    val in = spark.read.parquet(consumed: _*)
    val groupCols = in.schema.fields.collect {
      case f if !graft.profile.ProfileSchema.isProfileType(f.dataType) =>
        f.name
    }.toSeq
    ProfileSession.mergeProfiles(in, groupCols)
      .write.mode("overwrite")
      .parquet(s"$storePath/batch=compact_$upToBatchId")
  }

  /** Delete per-trigger and checkpoint directories made redundant by a
    * COMPLETE checkpoint — pure garbage collection, safe to run (or
    * crash in) at any point after the checkpoint's `_SUCCESS` landed.
    */
  def vacuumStore(storePath: String): Unit = {
    val (ckpt, _) = storeParts(storePath)
    ckpt.foreach { case (id, _) =>
      batchDirs(storePath).foreach {
        case (BatchDir(bid), p) if bid <= id =>
          deleteRecursively(new java.io.File(p))
        case (CompactDir(cid), p) if cid < id =>
          deleteRecursively(new java.io.File(p))
        case _ =>
      }
    }
  }

  private object BatchDir {
    def unapply(name: String): Option[Long] = {
      val s = name.stripPrefix("batch=")
      if (s.nonEmpty && s.forall(_.isDigit)) Some(s.toLong) else None
    }
  }
  private object CompactDir {
    def unapply(name: String): Option[Long] = {
      val s = name.stripPrefix("batch=")
      if (s.startsWith("compact_") && s.drop(8).nonEmpty &&
        s.drop(8).forall(_.isDigit)) Some(s.drop(8).toLong)
      else None
    }
  }

  private def batchDirs(storePath: String): Seq[(String, String)] = {
    val root = new java.io.File(storePath)
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(f => (f.getName, f.getAbsolutePath))
  }

  /** (best complete checkpoint, live per-trigger dirs after it). */
  private def storeParts(storePath: String)
      : (Option[(Long, String)], Seq[(Long, String)]) = {
    val dirs = batchDirs(storePath)
    val complete = dirs.collect {
      case (CompactDir(id), p)
          if new java.io.File(p, "_SUCCESS").exists() => (id, p)
    }
    val best = complete.sortBy(-_._1).headOption
    val floor = best.map(_._1).getOrElse(Long.MinValue)
    val live = dirs.collect {
      case (BatchDir(id), p) if id > floor => (id, p)
    }
    (best, live)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRecursively)
    f.delete(): Unit
  }

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
        readStored(spark, storePath), keys :+ "window")
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
