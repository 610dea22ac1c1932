package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sequence packing for LM training prep: documents are laid out in a
  * deterministic global order, concatenated into one token stream, and
  * chunked into fixed `budget`-token training sequences (the standard
  * concat-and-chunk regime — docs may straddle pack boundaries).
  *
  * Each doc gets its global `start_offset`, the `pack_id` it starts in
  * (start_offset / budget) and its `pack_offset` within that pack — the
  * coordinates a data loader needs to materialize packed sequences.
  *
  * Scale shape — a distributed prefix sum, NOT a global window. A naive
  * `sum over (order by ...)` collapses to ONE task holding the whole
  * corpus. Instead: (1) range-repartition + in-partition sort on the
  * order key (ONE exchange of 3 longs/row — every other column is
  * pruned before the shuffle); (2) per-partition token totals
  * (numPartitions rows) cumulated into exclusive offsets and joined
  * back ON the partition id; (3) per-partition running sum under a
  * window PARTITIONED BY the partition id — every partition scans in
  * parallel. The offsets join is deliberately NOT a broadcast: the
  * window needs an Exchange hashpartitioning(__pid) regardless, the
  * join reuses that same distribution, and a broadcast would put the
  * corpus-wide cache fill inside the BroadcastExchange future, where
  * spark.sql.broadcastTimeout (default 300 s) kills any multi-TB run.
  *
  * The sorted frame is persisted (MEMORY_AND_DISK, 3 longs/row): the
  * offsets pass and the running-sum pass must observe the SAME range
  * boundaries, and two materializations of a range exchange re-SAMPLE
  * them (RangePartitioner seeds by RDD id — a second physical exchange
  * can legally pick different splits, silently corrupting offsets at
  * scale; the spec pins a single rangepartitioning materialization).
  */
object Packing {

  /** Pack layout for each document. Output: idCol, n_tokens (tokCol),
    * start_offset, pack_id, pack_offset. `orderCol` defines the
    * concatenation order (idCol is appended as a tiebreak so equal
    * order keys still get a deterministic layout).
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokCol: String,
      orderCol: String,
      budget: Long): DataFrame =
    packSequencesReleasable(df, idCol, tokCol, orderCol, budget)._1

  /** [[packSequences]] plus a release() thunk for the persisted layout
    * frame (same contract as
    * [[Dedup.minHashLshPairsReleasable]]: call release() once the
    * returned plan has been materialized).
    */
  def packSequencesReleasable(
      df: DataFrame,
      idCol: String,
      tokCol: String,
      orderCol: String,
      budget: Long): (DataFrame, () => Unit) = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val sorted = df
      .select(col(idCol), col(tokCol).cast("long").as("n_tokens"),
        col(orderCol).as("__ord"))
      .repartitionByRange(col("__ord"), col(idCol))
      .sortWithinPartitions(col("__ord"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-partition totals -> exclusive cumulative offsets. numPartitions
    // rows: the single-partition window is driver-scale by construction.
    val offsets = sorted.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__psum"))
      .withColumn("__poffset",
        coalesce(sum(col("__psum")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__psum")

    val running = Window.partitionBy(col("__pid"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val out = sorted
      .join(offsets, Seq("__pid"))
      .withColumn("start_offset",
        col("__poffset") + sum(col("n_tokens")).over(running)
          - col("n_tokens"))
      .select(col(idCol), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div ${budget}L").as("pack_id"),
        expr(s"start_offset % ${budget}L").as("pack_offset"))
    (out, () => { sorted.unpersist(); () })
  }

  /** Per-pack summary of [[packSequences]]: how many docs START in each
    * pack and how many of the pack's tokens they contribute (boundary
    * docs spill their tail into later packs; `budget * pack_id` +
    * `pack_offset` of the next pack recovers exact spans).
    */
  def packStats(packed: DataFrame): DataFrame =
    packed.groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens_started"))

  /** Length-bucketed batching report — the OTHER way to fight padding
    * waste (the alternative to [[packSequences]]' concat-and-chunk):
    * assign each sequence to the smallest bucket boundary >= its
    * length (sequences longer than the last boundary truncate to it),
    * then measure what batching by bucket would cost: per bucket —
    * n_seqs, bucket_len, sum_len, padded tokens (= n * bucket_len),
    * waste_frac (padding / padded). The total waste_frac across
    * buckets is the padding bill a bucketed dataloader pays; compare
    * against uniform max-length padding to size the win.
    *
    * Map-only assignment (a literal boundary ladder in one CASE
    * chain) + one bounded aggregate over |buckets| cells.
    */
  def lengthBuckets(
      df: DataFrame,
      lenCol: String,
      boundaries: Seq[Long]): DataFrame = {
    require(boundaries.nonEmpty, "need at least one bucket boundary")
    require(boundaries == boundaries.sorted && boundaries.head > 0,
      "boundaries must be ascending and positive")
    require(boundaries.distinct.size == boundaries.size,
      "boundaries must be distinct")
    val len = col(lenCol).cast("long")
    val bucket = boundaries.reverse.tail.foldLeft(
      lit(boundaries.last)) { (acc, b) =>
      when(len <= b, lit(b)).otherwise(acc)
    }
    val eff = least(len, lit(boundaries.last))
    df.filter(len.isNotNull && len > 0)
      .select(bucket.as("bucket_len"), eff.as("__l"))
      .groupBy(col("bucket_len"))
      .agg(count(lit(1)).as("n_seqs"),
        sum(col("__l")).as("sum_len"))
      .withColumn("padded_tokens", col("n_seqs") * col("bucket_len"))
      .withColumn("waste_frac",
        (col("padded_tokens") - col("sum_len")).cast("double") /
          col("padded_tokens"))
  }
}
