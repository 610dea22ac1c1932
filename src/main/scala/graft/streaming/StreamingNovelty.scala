package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** n-gram novelty scoring under Structured Streaming: each arriving
  * document is scored against a STATIC reference corpus's gram set as
  * the stream runs (ingest-time memorization screens, crawl-refresh
  * novelty gating). The batch twin is [[TextOps.ngramNovelty]]; this is
  * the same contract re-planned for a stream.
  *
  * Plan shape — deliberately STATELESS: the reference's gram hashes
  * are materialized ONCE into a broadcast — either the exact sorted
  * long array ([[referenceGrams]]) or fixed-size Bloom filter bytes
  * ([[referenceGramsBloom]]) — and scoring is a row-local projection
  * over each document's in-row-distinct gram hashes probing it. No
  * stream-static join, no streaming aggregation, no watermark, zero
  * state-store operators (spec-pinned): the query runs in append mode
  * at source parallelism, and the same column works unchanged on a
  * batch frame (equivalence spec-pinned against
  * [[TextOps.ngramNovelty]]).
  *
  * Scale posture, in order of reference size: the exact array costs
  * 8 bytes per distinct gram (10^8 grams = 800 MB — executor-memory
  * scale) and its build COLLECTS every distinct hash to the driver;
  * past what the driver should hold, [[referenceGramsBloom]] bounds
  * both driver and broadcast at O(numBits) with a documented FP-rate
  * undercount; beyond resident filters entirely, score in micro-batch
  * joins against the bucketed stored form
  * ([[TextOps.ngramNoveltyStored]]).
  */
object StreamingNovelty {

  /** Materialize the reference corpus's distinct gram hashes as a
    * sorted broadcast array. Runs ONCE at query construction — the
    * distinct reduces executor-side to 8-byte hashes before the single
    * driver collect, the only corpus-sized work in the pipeline.
    *
    * The collect is GUARDED by a measured probe (the knnLabelNoise /
    * trendSlope precedent — a doc-only footprint contract does not
    * stop a caller): one approx_count_distinct aggregate runs BEFORE
    * the driver collect (refusing after would already have OOMed the
    * driver), and a reference whose distinct-gram estimate exceeds
    * `maxExactGrams` (default 50M = ~400 MB of driver/broadcast
    * longs) is refused with a pointer to [[referenceGramsBloom]] /
    * [[TextOps.ngramNoveltyStored]]. [[referenceAuto]] routes instead
    * of refusing. The estimate carries HLL error (~2%), so treat the
    * threshold as soft and size it with margin.
    */
  def referenceGrams(
      reference: DataFrame,
      textCol: String,
      n: Int,
      maxExactGrams: Long = 50000000L): Broadcast[Array[Long]] = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val grams = reference
      .select(explode(TextOps.ngrams(col(textCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
    if (!charBoundWithinBudget(reference, textCol, maxExactGrams)) {
      val approx = probeDistinctGrams(grams)
      require(approx <= maxExactGrams,
        s"~$approx distinct grams exceed maxExactGrams=$maxExactGrams " +
          "for the exact driver-resident array; use referenceGramsBloom " +
          "(fixed footprint, FP-rate undercount) or " +
          "TextOps.ngramNoveltyStored (nothing resident), or raise the " +
          "budget explicitly")
    }
    buildExact(grams, reference)
  }

  /** True when the exact-array guard provably cannot trip WITHOUT the
    * gram-explode HLL probe (the r14 probe doubled the reference scan
    * even for tiny corpora): either the caller opted out explicitly
    * (`maxExactGrams == Long.MaxValue` — the caller owns the
    * driver-memory risk) or the reference's total CHARACTER count —
    * one cheap column aggregate, no explode/hash/distinct — already
    * bounds the distinct gram count under the budget (a text of L
    * chars yields fewer than L word n-grams).
    */
  private def charBoundWithinBudget(
      reference: DataFrame, textCol: String, maxExactGrams: Long): Boolean =
    maxExactGrams == Long.MaxValue || {
      val r = reference
        .agg(sum(length(col(textCol)).cast("long")).as("__chars")).head()
      r.isNullAt(0) || r.getLong(0) <= maxExactGrams
    }

  /** The exact-array materialization (distinct -> collect -> sort ->
    * broadcast), shared by [[referenceGrams]] and [[referenceAuto]] so
    * the two routes cannot drift.
    */
  private def buildExact(
      grams: DataFrame, reference: DataFrame): Broadcast[Array[Long]] = {
    val hashes = grams.distinct().collect().map(_.getLong(0))
    java.util.Arrays.sort(hashes)
    reference.sparkSession.sparkContext.broadcast(hashes)
  }

  private def probeDistinctGrams(grams: DataFrame): Long =
    grams.agg(approx_count_distinct(col("gh")).as("__d"))
      .head().getLong(0)

  /** A routed novelty reference: carries whichever materialized form
    * the probe chose plus the gram size, so scoring needs no caller
    * knowledge of the route. `exact` is false on the Bloom route,
    * where novelty is a LOWER BOUND by the filter's FP rate.
    */
  sealed trait NoveltyReference extends Serializable {
    def n: Int
    def exact: Boolean
    def score(df: DataFrame, idCol: String, textCol: String): DataFrame
  }

  final case class ExactNoveltyReference(
      ref: Broadcast[Array[Long]], n: Int) extends NoveltyReference {
    def exact: Boolean = true
    def score(df: DataFrame, idCol: String, textCol: String): DataFrame =
      StreamingNovelty.score(df, ref, idCol, textCol, n)
  }

  final case class BloomNoveltyReference(
      ref: Broadcast[Array[Byte]], n: Int) extends NoveltyReference {
    def exact: Boolean = false
    def score(df: DataFrame, idCol: String, textCol: String): DataFrame =
      StreamingNovelty.scoreBloom(df, ref, idCol, textCol, n)
  }

  /** Probe-and-route reference build: the measured distinct-gram
    * estimate picks [[referenceGrams]] (exact membership) at or under
    * `maxExactGrams` and [[referenceGramsBloom]] (fixed footprint,
    * documented FP-rate undercount) above it — the footgun-free
    * entry point for corpora of unknown size. The probe aggregate is
    * skipped when the cheap character-count bound already proves the
    * exact route fits; the exact route re-reads the reference once
    * more for its collect (same cost it always had).
    */
  def referenceAuto(
      reference: DataFrame,
      textCol: String,
      n: Int,
      maxExactGrams: Long = 50000000L,
      numBits: Long = 1L << 27,
      numHashFns: Int = 5): NoveltyReference = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val grams = reference
      .select(explode(TextOps.ngrams(col(textCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
    if (charBoundWithinBudget(reference, textCol, maxExactGrams) ||
        probeDistinctGrams(grams) <= maxExactGrams) {
      ExactNoveltyReference(buildExact(grams, reference), n)
    } else {
      BloomNoveltyReference(
        referenceGramsBloom(reference, textCol, n, numBits, numHashFns), n)
    }
  }

  /** [[referenceGrams]] with a FIXED driver/broadcast footprint: the
    * reference's gram hashes collapse into [[graft.functions.bloom_agg]]
    * filter bytes — O(numBits / 8) bytes REGARDLESS of corpus size
    * (one fixed-size buffer per partition crosses the exchange and
    * word-OR-merges; the driver never holds 8 bytes × distinct grams,
    * which for a 100 TB reference is billions of longs — driver OOM).
    * No distinct pass is needed at all: Bloom insertion is idempotent,
    * so this is strictly cheaper to build than the exact array.
    *
    * Membership carries Bloom FP semantics: a false positive marks a
    * genuinely novel gram as seen, so [[scoreBloom]] novelty is a
    * LOWER BOUND, low by at most the filter's FP rate — size numBits ≈
    * 10 × expected distinct grams for ~1% FP at numHashFns = 5 and
    * document the rate at the call site. Prefer [[referenceGrams]]
    * (exact) while the gram set fits executor memory, and the stored
    * bucketed path ([[TextOps.ngramNoveltyStored]]) when even filter
    * bytes are not wanted resident.
    */
  def referenceGramsBloom(
      reference: DataFrame,
      textCol: String,
      n: Int,
      numBits: Long = 1L << 27,
      numHashFns: Int = 5): Broadcast[Array[Byte]] = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val bytes = reference
      .select(explode(TextOps.ngrams(col(textCol), n)).as("g"))
      .agg(graft.functions.bloom_agg(xxhash64(col("g")), numBits,
        numHashFns).as("__bloom"))
      .head().getAs[Array[Byte]](0)
    reference.sparkSession.sparkContext.broadcast(bytes)
  }

  /** Row-local novelty columns against a [[referenceGrams]] broadcast:
    * n_grams (in-row-distinct gram count), n_novel (grams absent from
    * the reference), novelty = n_novel / n_grams. Usable on streaming
    * AND batch frames; documents shorter than n tokens are dropped
    * (the batch form's no-row semantics).
    */
  def score(
      df: DataFrame,
      ref: Broadcast[Array[Long]],
      idCol: String,
      textCol: String,
      n: Int): DataFrame =
    scoreWith(df,
      h => graft.functions.in_sorted_long_set_bcast(ref, h),
      idCol, textCol, n)

  /** [[score]] against [[referenceGramsBloom]] filter bytes — same
    * columns, bounded reference state, novelty a lower bound by the
    * filter's FP rate (no false negatives: a gram reported novel truly
    * is).
    */
  def scoreBloom(
      df: DataFrame,
      ref: Broadcast[Array[Byte]],
      idCol: String,
      textCol: String,
      n: Int): DataFrame =
    scoreWith(df,
      h => graft.functions.bloom_might_contain_bcast(ref, h),
      idCol, textCol, n)

  private def scoreWith(
      df: DataFrame,
      seen: Column => Column,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val hashes = transform(TextOps.ngrams(col(textCol), n),
      g => xxhash64(g))
    df.select(col(idCol), hashes.as("__gh"))
      .filter(size(col("__gh")) > 0)
      .select(col(idCol),
        size(col("__gh")).cast("long").as("n_grams"),
        size(filter(col("__gh"), h => !seen(h))).cast("long")
          .as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
  }
}
