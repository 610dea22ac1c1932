package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism for operators whose FIRST stage does heavy
  * per-row work (quadratic in-block scoring, tokenize + n-gram explode,
  * per-row digests): a map-only lineage over a small scan arrives with
  * the file split count — often 1-3 tasks for a sub-128 MB parquet file —
  * and the whole pre-exchange stage serializes there while the rest of
  * the machine idles (measured on the bench: fuzzy_join's 1.44M-pair
  * levenshtein stage ran as ONE task, 9.2 s single-pass; 0.6 s spread).
  *
  * [[spreadIfNarrow]] round-robin repartitions to the session's shuffle
  * parallelism, but ONLY when the input is map-only (Dataset.rdd on an
  * exchange-bearing plan executes those stages eagerly under AQE — the
  * aggProfiles auto-parallelize contract, ProfileSession.scala) and
  * under-split by 2x. Large inputs already arrive with enough scan
  * partitions, so at scale this is a NO-OP; it never fires on streaming
  * frames. As a bonus, when several consumers branch off the spread
  * frame they reuse ONE exchange instead of re-running the scan.
  */
private[graft] object Parallelism {
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    // ops kill-switch (also the before/after lever for plan audits):
    // spark.graft.spreadNarrow=false restores the pre-r18 scan-split
    // parallelism everywhere this helper is applied
    if (!df.sparkSession.conf
        .get("spark.graft.spreadNarrow", "true").toBoolean) return df
    val target = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val mapOnly =
      try df.queryExecution.sparkPlan.collectFirst {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e
      }.isEmpty
      catch { case _: Throwable => false }
    val inParts =
      if (!mapOnly) target
      else try df.rdd.getNumPartitions catch { case _: Throwable => target }
    if (mapOnly && inParts * 2 <= target) df.repartition(target) else df
  }
}
