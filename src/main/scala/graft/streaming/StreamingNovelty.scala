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
  * Plan shape — deliberately STATELESS: the reference's distinct gram
  * hashes are materialized ONCE into a sorted broadcast long array
  * ([[referenceGrams]]), and scoring is a row-local projection over
  * each document's in-row-distinct gram hashes probing that array
  * ([[InSortedLongSetBroadcast]], exact membership — a Bloom here would
  * silently undercount novelty). No stream-static join, no streaming
  * aggregation, no watermark, zero state-store operators (spec-pinned):
  * the query runs in append mode at source parallelism, and the same
  * column works unchanged on a batch frame (equivalence spec-pinned
  * against [[TextOps.ngramNovelty]]).
  *
  * Scale posture: broadcast cost is 8 bytes per distinct reference gram
  * (10^8 grams = 800 MB — executor-memory scale, not cluster scale).
  * Beyond that, score in micro-batch joins against the bucketed stored
  * form ([[TextOps.ngramNoveltyStored]]) instead.
  */
object StreamingNovelty {

  /** Materialize the reference corpus's distinct gram hashes as a
    * sorted broadcast array. Runs ONCE at query construction — the
    * distinct reduces executor-side to 8-byte hashes before the single
    * driver collect, the only corpus-sized work in the pipeline.
    */
  def referenceGrams(
      reference: DataFrame,
      textCol: String,
      n: Int): Broadcast[Array[Long]] = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val hashes = reference
      .select(explode(TextOps.ngrams(col(textCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
      .collect().map(_.getLong(0))
    java.util.Arrays.sort(hashes)
    reference.sparkSession.sparkContext.broadcast(hashes)
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
      n: Int): DataFrame = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    val seen: Column => Column =
      h => graft.functions.in_sorted_long_set_bcast(ref, h)
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
