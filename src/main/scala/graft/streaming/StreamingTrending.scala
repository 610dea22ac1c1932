package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.ops.EventStats.trendingItems]]: per-bucket
  * item counts as a WINDOWED STATEFUL AGGREGATE — the canonical
  * Structured Streaming shape (watermark + `groupBy(window, item)
  * .count`), state = one long per live (bucket, item) cell, dropped
  * once the watermark passes the bucket end.
  *
  * The count per (bucket, item) is monotone across triggers in update
  * mode, so a sink's latest row per cell equals the batch cell table;
  * the per-bucket top-k is a bounded post-query over the CELL sink
  * ([[topK]]), exactly as the batch operator ranks cells, never
  * events.
  */
object StreamingTrending {

  /** Per-(bucket, item) running counts over a stream; epoch-aligned
    * buckets of `bucketSeconds`. Output: bucket_start (epoch micros),
    * item, n.
    *
    * `watermarkDelay` bounds state AND defines lateness: buckets older
    * than the watermark drop their state and later arrivals for them
    * are discarded — size it to the stream's real disorder. Replay
    * fixtures that must lose nothing should use a delay wider than
    * the replayed time range (the specs and driver check do).
    */
  def itemCounts(
      df: DataFrame,
      tsCol: String,
      itemCol: String,
      bucketSeconds: Long,
      watermarkDelay: String = "1 hour"): DataFrame = {
    require(bucketSeconds > 0,
      s"bucketSeconds must be > 0, got $bucketSeconds")
    val micros = bucketSeconds * 1000000L
    val src = df
      .filter(col(itemCol).isNotNull)
      .select(
        (floor(graft.ops.EventTime.micros(df, tsCol) / micros) * micros)
          .as("bucket_start"),
        col(itemCol).as("item"))
      // the watermark column must be a time type; bucket micros map
      // back to a timestamp losslessly
      .withColumn("__bucket_ts",
        timestamp_micros(col("bucket_start")))
      .withWatermark("__bucket_ts", watermarkDelay)
    src.groupBy(col("__bucket_ts"), col("bucket_start"), col("item"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket_start"), col("item"), col("n"))
  }

  /** Batch top-k over a cell frame (a memory-sink table of
    * [[itemCounts]] updates, reduced to its latest row per cell, or
    * any (bucket_start, item, n) frame): rank per bucket by (n desc,
    * item asc), keep rank <= k.
    */
  def topK(cells: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket_start"))
      .orderBy(col("n").desc, col("item").asc)
    cells.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
