package graft

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction

import graft.metrics.ProfileConfig

/** `org.apache.spark.sql.functions`-style facade for the engine's custom
  * aggregates and sketch-finish expressions. Everything here returns a
  * [[Column]] usable in `df.agg(...)` / `df.select(...)`; `registerAll`
  * additionally makes them SQL-callable.
  */
package object functions {

  private def expr(c: Column): Expression = GraftBridge.expression(c)
  private def col(e: Expression): Column = GraftBridge.column(e)
  private def agg(a: AggregateFunction): Column =
    col(a.toAggregateExpression())

  /** Full column profile (counters, type inference, number/string stats,
    * KLL quantiles, theta/HLL distincts, frequent items) in one pass.
    */
  def profile(c: Column): Column = agg(ColumnProfileAgg(expr(c)))
  def profile(c: Column, cfg: ProfileConfig): Column =
    agg(ColumnProfileAgg(expr(c), cfg))

  /** Full-pass profile finishing to the RAW state binary (no summary) —
    * the cheap intermediate for multi-level merges; finish with
    * [[profile_merge]], which accepts it directly.
    */
  def profile_state(c: Column, cfg: ProfileConfig = ProfileConfig.default): Column =
    agg(ColumnProfileStateAgg(expr(c), cfg))

  /** Re-aggregate stored profiles (profile struct or raw state binary). */
  def profile_merge(c: Column): Column = agg(ProfileMergeAgg(expr(c)))

  // --- KLL quantile sketch ---
  def kll_agg(c: Column, k: Int = 256): Column = agg(KllAgg(expr(c), k))
  def kll_merge(c: Column, k: Int = 256): Column = agg(KllMergeAgg(expr(c), k))
  def kll_quantile(sketch: Column, rank: Column): Column =
    col(KllQuantile(expr(sketch), expr(rank)))
  def kll_quantiles(sketch: Column, ranks: Column): Column =
    col(KllQuantiles(expr(sketch), expr(ranks)))
  def kll_n(sketch: Column): Column = col(KllN(expr(sketch)))
  def kll_rank(sketch: Column, value: Column): Column =
    col(KllRank(expr(sketch), expr(value)))
  def kll_histogram(sketch: Column, bins: Column): Column =
    col(KllHistogram(expr(sketch), expr(bins)))
  def kll_histogram_splits(sketch: Column, splits: Column): Column =
    col(KllHistogramSplits(expr(sketch), expr(splits)))
  def kll_histogram_splits(sketch: Column, splits: Seq[Double]): Column =
    kll_histogram_splits(sketch,
      org.apache.spark.sql.functions.array(
        splits.map(org.apache.spark.sql.functions.lit): _*))

  // --- Theta distinct sketch ---
  def theta_agg(c: Column, nominalEntries: Int = 4096): Column =
    agg(ThetaAgg(expr(c), nominalEntries))
  def theta_merge(c: Column, nominalEntries: Int = 4096): Column =
    agg(ThetaMergeAgg(expr(c), nominalEntries))
  def theta_estimate(sketch: Column): Column = col(ThetaEstimate(expr(sketch)))
  def theta_summary(sketch: Column): Column = col(ThetaSummary(expr(sketch)))
  def theta_intersect(a: Column, b: Column): Column =
    col(ThetaIntersect(expr(a), expr(b)))
  def theta_a_not_b(a: Column, b: Column): Column =
    col(ThetaAnotB(expr(a), expr(b)))

  // --- HLL cardinality sketch ---
  def hll_agg(c: Column, lgK: Int = 12): Column = agg(HllAgg(expr(c), lgK))
  def hll_merge(c: Column, lgK: Int = 12): Column = agg(HllMergeAgg(expr(c), lgK))
  def hll_estimate(sketch: Column): Column = col(HllEstimate(expr(sketch)))
  def hll_summary(sketch: Column): Column = col(HllSummary(expr(sketch)))

  // --- Vector math (codegen'd) ---
  /** Dot product of two numeric arrays, double accumulation, fused loop. */
  def vec_dot(a: Column, b: Column): Column = col(VecDot(expr(a), expr(b)))

  /** Count of positions where two long arrays agree (fused loop). */
  def vec_match_count(a: Column, b: Column): Column =
    col(VecMatchCount(expr(a), expr(b)))

  /** One-pass 64-bit SimHash over whitespace tokens of lower(text). */
  def simhash64(text: Column): Column = col(SimHash64(expr(text)))

  /** Per-band bucket hashes of a MinHash signature (one scan, all bands). */
  def band_hashes(sig: Column, bands: Int): Column =
    col(BandHashes(expr(sig), bands))

  /** Per-band sign-bit LSH buckets of an embedding (one scan, all planes). */
  def hyperplane_bands(emb: Column, planes: Array[Array[Double]],
      bitsPerBand: Int): Column =
    col(HyperplaneBands(expr(emb), planes, bitsPerBand))

  /** Top-n centroid ids by cosine against a driver-side centroid literal. */
  def top_centroids(emb: Column, centroids: Array[Array[Double]], n: Int): Column =
    col(TopCentroids(expr(emb), centroids, n))

  /** [[top_centroids]] with the centroid table as a broadcast handle —
    * use for large codebooks so tasks/plans stay small.
    */
  def top_centroids_bcast(emb: Column,
      centroids: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      n: Int): Column =
    col(TopCentroidsBroadcast(expr(emb), centroids, n))

  /** Lazy generator of all sorted in-bucket id pairs (id_a < id_b). */
  def pair_generator(ids: Column): Column = col(PairGenerator(expr(ids)))

  /** PQ asymmetric-distance inner product of a query vector against an
    * item's PQ codes, codebooks as a broadcast handle (no per-pair
    * reconstruction allocation).
    */
  def pq_adc_bcast(query: Column, codes: Column,
      codebooks: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]])
      : Column =
    col(PqAdcBroadcast(expr(query), expr(codes), codebooks))

  /** Mean hashed-slot weight of a text's tokens (fastText-style linear
    * scoring core); formula weights when no table is given.
    */
  def hashed_token_score(text: Column, nBuckets: Int,
      weights: Option[org.apache.spark.broadcast.Broadcast[Array[Double]]] = None)
      : Column =
    col(HashedTokenScore(expr(text), nBuckets, weights))

  /** PQ codes (euclidean argmin per subspace, one pass, all subspaces). */
  def pq_encode_bcast(emb: Column,
      codebooks: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]])
      : Column =
    col(PqEncodeBroadcast(expr(emb), codebooks))

  /** Bounded top-k aggregate (map-side partial; k best per group). */
  def topk_agg(score: Column, id: Column, k: Int): Column =
    agg(TopKAgg(expr(score), expr(id), k))

  /** Elementwise array sum aggregate -> array<double>. */
  def vec_sum(c: Column): Column = agg(VecSumAgg(expr(c)))

  /** Elementwise array min aggregate over array<long>. */
  def vec_min(c: Column): Column = agg(VecMinAgg(expr(c)))

  /** All Carter-Wegman rehashes of a base hash in one pass. */
  def carter_wegman_hashes(h: Column, params: Array[(Long, Long)]): Column =
    col(CarterWegmanHashes(expr(h), params))

  /** Row-local MinHash signature: shingle -> hash -> elementwise min. */
  def minhash_sig(text: Column, shingleK: Int,
      params: Array[(Long, Long)]): Column =
    col(MinHashSig(expr(text), shingleK, params))

  /** Unicode NFC canonical composition (codegen'd static call). */
  def nfc_normalize(text: Column): Column = col(NfcNormalize(expr(text)))

  /** Jaro-Winkler similarity in [0, 1] (codegen'd static call;
    * DuckDB-parity semantics — see [[JaroWinkler]]).
    */
  def jaro_winkler(a: Column, b: Column): Column =
    col(JaroWinkler(expr(a), expr(b)))

  /** Shannon entropy (nats) of a string's codepoint distribution. */
  def char_entropy(text: Column): Column = col(CharEntropy(expr(text)))

  // --- Bloom membership filter ---
  /** Bloom filter aggregate over pre-hashed keys (`xxhash64(col)`). */
  def bloom_agg(hash: Column, numBits: Long = 1L << 23,
      numHashFns: Int = 5): Column =
    agg(BloomAgg(expr(hash), numBits, numHashFns))

  /** Membership probe against [[bloom_agg]] bytes (no false negatives). */
  def bloom_might_contain(bloom: Column, hash: Column): Column =
    col(BloomMightContain(expr(bloom), expr(hash)))

  /** [[bloom_might_contain]] with the filter as a broadcast handle — the
    * row-stream form: no per-row byte copies (use for corpus scans).
    */
  def bloom_might_contain_bcast(
      bloom: org.apache.spark.broadcast.Broadcast[Array[Byte]],
      hash: Column): Column =
    col(BloomMightContainBroadcast(bloom, expr(hash)))

  /** EXACT membership of a 64-bit hash in a broadcast sorted long
    * array — [[bloom_might_contain_bcast]] without false positives,
    * for sets that fit executor memory (8 bytes/entry).
    */
  def in_sorted_long_set_bcast(
      set: org.apache.spark.broadcast.Broadcast[Array[Long]],
      hash: Column): Column =
    col(InSortedLongSetBroadcast(set, expr(hash)))

  // --- Frequent items ---
  def freq_items_agg(c: Column, maxMapSize: Int = 128): Column =
    agg(FreqItemsAgg(expr(c), maxMapSize))
  def freq_items_merge(c: Column, maxMapSize: Int = 128): Column =
    agg(FreqItemsMergeAgg(expr(c), maxMapSize))
  def freq_items_topk(sketch: Column, k: Column): Column =
    col(FreqItemsTopK(expr(sketch), expr(k)))

  /** Register all functions in the session's registry (SQL-callable) —
    * the temp-function twin of `graft.GraftExtensions`, sharing its one
    * name -> builder list.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftExtensions.functions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
