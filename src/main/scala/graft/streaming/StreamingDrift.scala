package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.metrics.ProfileConfig
import graft.ops.Drift

/** Continuous drift monitoring under Structured Streaming: windowed
  * streaming profiles ([[StreamingProfile.windowedProfiles]]) scored
  * against a STATIC reference profile as the stream runs.
  *
  * Plan shape: the reference's sketch bytes resolve to literals at plan
  * construction ([[graft.ops.Drift.againstReference]]), so scoring is a
  * pure projection over the streaming aggregate's output — ONE stateful
  * aggregation (state = sketch bytes per window x key x column), zero
  * additional shuffles, no stream-static join. The alert predicate
  * evaluates per emitted row, so a `filter` + any streaming sink turns
  * this into an alerting pipeline.
  *
  * The reference library has no streaming engine; this is the streaming
  * composition of its profile mergeability
  * (DatasetProfile.java:241-250) with the PSI drift metric its
  * monitoring platform applies to uploaded profiles.
  */
object StreamingDrift {

  /** Per-window PSI drift of a streaming frame against `reference` (one
    * merged profile row, e.g. `ProfileSession.mergeProfiles` of a stored
    * baseline). Output (streaming): `window`, keys, one `<col>_psi` per
    * entry of `edges`.
    */
  def monitor(
      df: DataFrame,
      timeColumn: String,
      cadence: String,
      watermark: String,
      reference: DataFrame,
      edges: Map[String, Seq[Double]],
      keys: Seq[String] = Nil,
      cfg: ProfileConfig = ProfileConfig.default): DataFrame = {
    val profiles = StreamingProfile.windowedProfiles(
      df, timeColumn, cadence, watermark, keys, cfg)
    Drift.againstReference(profiles, reference, edges,
      keep = "window" +: keys)
  }

  /** [[monitor]] filtered to windows whose PSI exceeds `threshold` on ANY
    * monitored column — the rows an alerting sink should see.
    */
  def alerts(
      df: DataFrame,
      timeColumn: String,
      cadence: String,
      watermark: String,
      reference: DataFrame,
      edges: Map[String, Seq[Double]],
      threshold: Double,
      keys: Seq[String] = Nil,
      cfg: ProfileConfig = ProfileConfig.default): DataFrame = {
    require(edges.nonEmpty, "alerts needs at least one monitored column")
    val scored = monitor(df, timeColumn, cadence, watermark, reference,
      edges, keys, cfg)
    val psiCols = edges.keys.toSeq.sorted.map(c => col(s"${c}_psi"))
    scored.filter(psiCols.map(_ > threshold).reduce(_ || _))
  }
}
