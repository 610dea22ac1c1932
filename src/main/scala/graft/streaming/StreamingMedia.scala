package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Media

/** The media quality screens under Structured Streaming — crawl-ingest
  * monitoring for a multimodal feed (blown captures, dead microphones,
  * static frames) as the data ARRIVES rather than in a nightly batch.
  *
  * Two layers, mirroring [[StreamingProfile]]'s split:
  *
  *  - STATELESS per-row screens: [[Media.imageQualityStats]] /
  *    [[Media.audioQualityStats]] are partition-local maps (decode +
  *    integer stats, zero shuffle), so the SAME entry points run
  *    unchanged on a streaming frame in append mode with zero
  *    state-store operators (spec-pinned). Nothing to add — call them
  *    on the stream.
  *  - WINDOWED monitors (this object): per event-time window, the
  *    verdict counts and summary stats an ingest dashboard alerts on,
  *    with a watermark bounding state. Corrupt blobs cost their ROW,
  *    never the QUERY — a poison blob would otherwise kill the stream
  *    and every restart after it (the batch lenient-decode policy,
  *    q262, matters MORE here) — and are surfaced per window as
  *    `n_corrupt`, an ingest health signal in its own right.
  *
  * State per window is one small struct (counts + sums): the state
  * store holds windows x ~100 bytes, independent of stream volume.
  */
object StreamingMedia {

  /** Windowed image-quality monitor over a streaming (ts, id, blob)
    * frame: per window — rows, corrupt rows, low-contrast count,
    * near-black/near-white pixel-fraction averages, gray extremes.
    * Append mode after the watermark closes a window.
    */
  def imageQualityMonitor(
      stream: DataFrame, tsCol: String, cadence: String, watermark: String,
      idCol: String, blobCol: String,
      darkBelow: Int = 77, brightAbove: Int = 688,
      minRange: Int = 100): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val stats = stream
      .select(col(tsCol).cast("timestamp"), col(idCol).cast("long"),
        col(blobCol))
      .as[(java.sql.Timestamp, Long, Array[Byte])]
      .mapPartitions(_.map { case (ts, id, blob) =>
        try {
          val q = Media.imageQualityRecord(id, blob, darkBelow,
            brightAbove, minRange)
          (ts, false, Some(q))
        } catch {
          // decode failures drop row-wise with an explicit count; a
          // thrown exception here would fail the STREAM permanently
          case scala.util.control.NonFatal(_) => (ts, true, None)
        }
      })
      .toDF("ts", "corrupt", "q")
    stats.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), cadence))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("corrupt"), 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("q.low_contrast"), 1L).otherwise(0L))
          .as("n_low_contrast"),
        avg(col("q.gray_mean")).as("mean_gray"),
        avg(col("q.frac_dark")).as("mean_frac_dark"),
        avg(col("q.frac_bright")).as("mean_frac_bright"),
        min(col("q.gray_min")).as("gray_min"),
        max(col("q.gray_max")).as("gray_max"))
  }

  /** Windowed audio-quality monitor over a streaming (ts, id, blob)
    * frame: per window — rows, corrupt rows, clipped / near-silent
    * counts, RMS average, peak maximum. Append mode after the
    * watermark closes a window.
    */
  def audioQualityMonitor(
      stream: DataFrame, tsCol: String, cadence: String, watermark: String,
      idCol: String, blobCol: String,
      clipAbove: Int = 32000, silenceBelow: Int = 100): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val stats = stream
      .select(col(tsCol).cast("timestamp"), col(idCol).cast("long"),
        col(blobCol))
      .as[(java.sql.Timestamp, Long, Array[Byte])]
      .mapPartitions(_.map { case (ts, id, blob) =>
        try {
          val q = Media.audioQualityRecord(id, blob, clipAbove,
            silenceBelow)
          (ts, false, Some(q))
        } catch {
          case scala.util.control.NonFatal(_) => (ts, true, None)
        }
      })
      .toDF("ts", "corrupt", "q")
    stats.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), cadence))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("corrupt"), 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("q.clipped"), 1L).otherwise(0L)).as("n_clipped"),
        sum(when(col("q.near_silent"), 1L).otherwise(0L))
          .as("n_near_silent"),
        avg(col("q.rms")).as("mean_rms"),
        max(col("q.peak")).as("peak_max"))
  }
}
