package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exact deduplication under Structured Streaming: emit each key's first
  * arrival, suppress repeats. The batch twin is
  * [[graft.ops.Dedup.exact]]; this is the streaming half of the same
  * contract, for ingest-time dedup of event/document feeds before they
  * reach the training store.
  *
  * Scale posture: [[firstArrivals]] uses
  * `dropDuplicatesWithinWatermark`, so the state store holds one entry
  * per DISTINCT key seen within the watermark horizon — state is bounded
  * by key cardinality per horizon, not stream length, and eviction is
  * automatic as the watermark advances. The unbounded-retention variant
  * ([[firstArrivalsUnbounded]]) trades that bound for exact
  * forever-dedup; at 100 TB feed scale, prefer the horizon form and
  * periodic batch [[graft.ops.Dedup.exact]] compaction of the store.
  */
object StreamingDedup {

  /** First arrival per `keyCols` within the watermark horizon: a repeat
    * observed while its key's state lives (any event whose time is
    * within `delay` of the first arrival's watermark window) is dropped;
    * a repeat arriving after eviction re-emits. Requires `tsCol` to be
    * an event-time timestamp column.
    */
  def firstArrivals(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      delay: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    df.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)
  }

  /** Exact forever-dedup: one state entry per distinct key, never
    * evicted. Correct at any horizon but state grows with total key
    * cardinality — bound it upstream (key by content hash after
    * normalization) or prefer [[firstArrivals]].
    */
  def firstArrivalsUnbounded(
      df: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    df.dropDuplicates(keyCols)
  }
}
