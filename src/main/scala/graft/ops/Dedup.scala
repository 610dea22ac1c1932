package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale posture (100 TB): every op is expressed as native column
  * expressions + a single keyed shuffle (groupBy on dedup key / LSH bucket).
  * Candidate generation is always bucketed — no all-pairs cross joins; the
  * quadratic step only runs inside a bucket, whose size is bounded by the
  * banding parameters.
  */
object Dedup {

  /** Exact dedup on arbitrary key columns: keeps the row with the smallest
    * `idCol` per key (deterministic winner). Planned as a hash aggregate
    * with `min_by` — map-side partial aggregation reduces each partition
    * to one candidate row per key BEFORE the shuffle, unlike the
    * row_number window formulation, which shuffles and sorts every
    * duplicate.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(keyCols.map(col): _*)
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Per-key duplicate statistics (survivor id + group size). */
  def exactStats(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_dupes"))

  /** Quality-aware exact dedup: keeps the BEST row per key — greatest
    * `scoreCol`, ties broken to the greatest `idCol` (lexicographic
    * (score, id) max, fully deterministic). The curation twin of
    * [[exact]]: when duplicates differ in quality (re-crawls, format
    * variants), keep the highest-scoring copy instead of the lowest id.
    * Same plan shape as [[exact]]: one `max_by` hash aggregate with
    * map-side partial combine.
    */
  def exactBest(
      df: DataFrame,
      keyCols: Seq[String],
      scoreCol: String,
      idCol: String): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(cols.map(col): _*),
        struct(col(scoreCol), col(idCol))).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Word k-shingles of the lowercased text (distinct, order-free set).
    * Monolithic expression ([[graft.functions.WordShingles]]) — single
    * scan per document.
    */
  def wordShingles(text: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.WordShingles(
        org.apache.spark.sql.GraftBridge.expression(text), k))

  /** Character k-shingles (distinct). */
  def charShingles(text: Column, k: Int): Column = {
    val n = length(text)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(1), n - k + 1), i => substring(text, i, lit(k))))
        .otherwise(array(text)))
  }

  /** Deterministic Carter-Wegman rehash family over a base 64-bit hash:
    * h_i(x) = (a_i * (x mod p) + b_i) mod p with p = 2^31-1. Products stay
    * under 2^62 (no ANSI overflow), one xxhash64 per shingle, then
    * numHashes multiply-add-mods — everything stays inside whole-stage
    * codegen.
    */
  private[graft] val MersennePrime = 2147483647L // 2^31 - 1

  private[graft] def affineParams(numHashes: Int): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(0x5eedL)
    Array.fill(numHashes)((
      1L + math.floorMod(rnd.nextLong(), MersennePrime - 1),
      math.floorMod(rnd.nextLong(), MersennePrime)))
  }

  /** MinHash signatures: (id, sig array<long>) via ONE row-local
    * expression ([[graft.functions.MinHashSig]]): shingle -> hash ->
    * elementwise running min, per document, zero shuffle. A document's
    * signature depends only on that document, so the earlier
    * explode + groupBy(id) + elementwise-min-aggregate plan paid an
    * explode materialization and a keyed shuffle for nothing; this is a
    * pure map stage (signature output = ids x numHashes longs).
    *
    * Null handling: a null text yields a row with a NULL sig
    * (minhash_sig is null-propagating) — the document is kept, not
    * dropped. Downstream LSH is unaffected (band_hashes propagates the
    * null and posexplode emits no buckets); direct consumers of
    * signatures should filter or coalesce null-sig rows themselves.
    */
  def minHashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      shingleK: Int): DataFrame = {
    val params = affineParams(numHashes)
    df.select(col(idCol).as("id"),
      graft.functions.minhash_sig(col(textCol), shingleK, params).as("sig"))
  }

  /** All in-bucket candidate pairs (id_a, id_b), id_a < id_b, from
    * bucket-keyed rows — the shared quadratic step of every LSH family
    * member (MinHash/SimHash/hyperplane/cluster/frame-hash buckets),
    * with the mega-bucket STRAGGLER fixed by salting. Buckets of at
    * most `saltTarget` ids pair through the lazy
    * [[graft.functions.PairGenerator]] exactly as before (one generator
    * row per bucket); a bucket of size s in (saltTarget, maxBucketSize]
    * splits into g = ceil(s / saltTarget) hash-salted groups whose
    * g*(g+1)/2 group-vs-group blocks pair via an equi-join keyed
    * (bucket, gi, gj) — the largest single task then owns
    * ~saltTarget^2 pairs (~2% of a 10k bucket's ~50M), not all of
    * them. The salt must happen BEFORE generation: a generator row is
    * unsplittable by AQE (one input row's output cannot be
    * re-partitioned), so a near-cap bucket previously serialized every
    * pair through one core. Buckets above `maxBucketSize` still drop
    * whole (the documented flat-content rule); singletons emit nothing.
    *
    * The emitted pair SET is identical to the unsalted generator: the
    * block decomposition is exhaustive and disjoint (a pair with group
    * ids a <= b appears exactly at block (a, b); within-block orderings
    * dedupe on id_a < id_b before least/greatest normalization).
    * Per-bucket duplicates across bands are preserved — callers dedupe
    * across buckets exactly as before.
    *
    * MEASURED-PROBE ROUTING (the [[graft.ops.EventStats.trendSlope]] /
    * knnLabelNoise pattern): the salted union plan has TWO consumers of
    * the bucket aggregate (the generator side and the block side), and
    * ReuseExchange only dedupes the shuffle WRITE — each consumer
    * re-runs the reduce-side collect_list, and the block branch
    * schedules its explode/repartition/join stages even when every
    * bucket is small. Committed r14→r15 bench artifacts priced that
    * always-on tax at 0.2–0.3 s/row on the sub-second dedup rows. A
    * 1-row count-only probe (max raw bucket size, map-side-combined —
    * the ids payload never rides it) therefore routes the COMMON case
    * (no bucket over saltTarget) to the historical single-consumer
    * collect_list + pair_generator plan, and builds the salted union
    * only when an oversized bucket is actually present. The probe runs
    * EAGERLY at construction; callers whose upstream is expensive to
    * recompute (codec decodes, minhash signatures) persist it first so
    * the probe pass re-reads a cache, not the codec.
    *
    * LAZY-CONSTRUCTION ATTEMPT, MEASURED AND REVERTED (r17): moving the
    * probe into the plan as a [[Dataset.scalar]] subquery (so
    * construction schedules no job) was benched in two variants against
    * this eager version on the same session. (a) big branch behind a
    * `probe > saltTarget` per-row filter over `banded`: the runtime
    * constant-false filter still runs the scan — audio_dedup
    * 0.576→0.718 s, phash_dups 0.499→0.590, video_dedup 0.551→0.640,
    * mih_hamming 3.96→4.79 (+16–25%). (b) big branch behind an
    * empty-broadcast gate (1-row frame filtered by the subquery,
    * crossJoin for AQE empty-relation collapse): common-case rows
    * unchanged vs (a) — the collapse does not beat the per-pass
    * subquery + union overhead — and the oversized regime lost its
    * bucket-exchange reuse entirely (mih_hamming 3.96→14.1 s, 3.6×).
    * The one-job eager probe over the caller-persisted input is the
    * measured optimum; laziness here is not worth 16–25% on every
    * sub-second LSH row.
    */
  private[ops] def cappedBucketPairs(
      banded: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      maxBucketSize: Int,
      saltTarget: Int = 1000): DataFrame = {
    require(saltTarget >= 2, s"saltTarget must be >= 2, got $saltTarget")
    val keys = keyCols.map(col)
    val buckets = banded
      .groupBy(keys: _*)
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))
    val probe = banded.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    val maxRawBucket = if (probe.isNullAt(0)) 0L else probe.getLong(0)
    if (maxRawBucket <= saltTarget)
      return buckets.select(graft.functions.pair_generator(col("ids"))
        .as(Seq("id_a", "id_b")))
    val small = buckets.filter(size(col("ids")) <= saltTarget)
      .select(graft.functions.pair_generator(col("ids"))
        .as(Seq("id_a", "id_b")))
    // explode the oversized arrays back to (bucket, group, id) rows —
    // row-local — then replicate each member over its block row/column:
    // the member of group a sits on the LEFT of blocks (a, j), j >= a,
    // and on the RIGHT of blocks (i, b), i <= b.
    val big = buckets.filter(size(col("ids")) > saltTarget)
      .withColumn("__g",
        ceil(size(col("ids")).cast("double") / saltTarget).cast("int"))
      .select(keys :+ col("__g") :+ explode(col("ids")).as("__id"): _*)
      .withColumn("__grp",
        pmod(xxhash64(col("__id")), col("__g")).cast("int"))
    // the streaming side is EXPLICITLY spread by block key with a
    // pinned partition count: the join's pair output explodes far past
    // its input bytes, so AQE's byte-based coalescing (and a broadcast
    // plan keeping the upstream 1-partition layout) would otherwise
    // funnel every block back through one task — the exact straggler
    // the salt exists to kill. An explicit repartition(n, cols) is
    // exempt from AQE coalescing.
    val blockParts = math.max(
      banded.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
      16)
    val leftSide = big.select(keys ++ Seq(
      col("__id").as("id_a"), col("__grp").as("__gi"),
      explode(sequence(col("__grp"), col("__g") - 1)).as("__gj")): _*)
      .repartition(blockParts,
        keys ++ Seq(col("__gi"), col("__gj")): _*)
    val rightSide = big.select(keys ++ Seq(
      col("__id").as("id_b"),
      explode(sequence(lit(0), col("__grp"))).as("__gi"),
      col("__grp").as("__gj")): _*)
    val bigPairs = leftSide
      .join(rightSide, keyCols ++ Seq("__gi", "__gj"))
      .filter(col("__gi") =!= col("__gj") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
    small.unionByName(bigPairs)
  }

  /** MinHash+LSH candidate pairs: signature -> bands -> bucket-join.
    *
    * Returns (id_a, id_b, est_jaccard) for pairs sharing >=1 LSH band,
    * id_a < id_b, est_jaccard = fraction of matching minhashes.
    *
    * Scale shape (each step sized for a 100 TB corpus):
    *  - band buckets come from one codegen scan of the signature
    *    ([[graft.functions.BandHashes]]) — no per-band slice/stringify;
    *  - the self-join carries ONLY (band, bucket, id) — signatures do not
    *    ride through the bucket shuffle (64 longs x bands duplication);
    *  - buckets larger than `maxBucketSize` are dropped before the join
    *    (a single boilerplate shingle otherwise makes one bucket hold a
    *    large fraction of the corpus and the pairwise step goes quadratic);
    *  - pairs found in multiple bands dedupe via groupBy BEFORE signatures
    *    are fetched, so each unique pair fetches its two signatures once;
    *  - agreement is a fused-loop codegen count
    *    ([[graft.functions.VecMatchCount]]), not an interpreted HOF.
    */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      maxBucketSize: Int = 10000): DataFrame =
    minHashLshPairsReleasable(df, idCol, textCol, numHashes, bands, shingleK,
      maxBucketSize)._1

  /** [[minHashLshPairs]] plus a release() thunk that unpersists the cached
    * signature intermediate. The cache is keyed by logical plan, so
    * repeated calls over the SAME input reuse one entry; long-lived
    * sessions running many distinct corpora should call release() once the
    * returned plan has been materialized (the plan recomputes signatures
    * if materialized again afterwards).
    */
  def minHashLshPairsReleasable(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      maxBucketSize: Int = 10000): (DataFrame, () => Unit) = {
    require(numHashes % bands == 0, "numHashes must divide into bands")

    // the signature pipeline (shingle -> hash -> 64 min-aggregates) is the
    // expensive compute stage and is referenced three times below (banding
    // + both sides of the pair join) — materialize it once. MEMORY_AND_DISK:
    // signatures are id + numHashes longs per doc, tiny next to the corpus.
    val sig = minHashSignatures(df, idCol, textCol, numHashes, shingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = sig.select(col("id"),
      posexplode(graft.functions.band_hashes(col("sig"), bands))
        .as(Seq("band", "bucket")))

    // ONE shuffle builds the buckets, applies the size cap, and generates
    // in-bucket candidate pairs lazily — near-cap buckets salt into
    // bounded blocks so no single task owns a mega-bucket's pairs
    // ([[cappedBucketPairs]]); buckets above maxBucketSize (boilerplate
    // shingles) are dropped so the quadratic in-bucket step stays bounded.
    val pairs = cappedBucketPairs(banded, Seq("band", "bucket"), "id",
      maxBucketSize)
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__nbands"))
      .drop("__nbands")

    val result = pairs
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (graft.functions.vec_match_count(col("sig_a"), col("sig_b"))
          .cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
    (result, () => { sig.unpersist(blocking = false); () })
  }

  /** Cross-corpus contamination detection (train/test decontamination):
    * pairs (corpus_id, probe_id) whose texts share >= `threshold` exact
    * shingle-Jaccard, candidates generated by the SAME banded-MinHash
    * shape as [[minHashLshPairs]] — both corpora flow through ONE bucket
    * shuffle with the side encoded in the id's low bit, pairs are
    * restricted to cross-side collisions, and the final filter recomputes
    * EXACT Jaccard on the candidate texts (LSH only proposes; the
    * estimate never decides, so borderline pairs are judged exactly).
    *
    * Requires integral ids on both sides (the side bit rides in the id).
    */
  /** Lines appearing in >= minDocFreq DISTINCT documents (CCNet-style
    * boilerplate detection: navbars, cookie banners, headers recur
    * across a corpus; real content does not). Per-doc distinctness is
    * row-local (array_distinct before the explode), so the one shuffle
    * carries distinct (line) keys with map-side combine.
    */
  def frequentLines(
      df: DataFrame,
      textCol: String,
      minDocFreq: Long): DataFrame = {
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    df.select(explode(array_distinct(split(col(textCol), "\n"))).as("line"))
      .groupBy(col("line")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)
  }

  /** [[frequentLines]] removal: every doc rewritten without its
    * corpus-frequent lines. Output: idCol, text (lines re-joined in
    * original order; "" if everything was boilerplate), n_removed.
    *
    * Scale shape: pass 1 is the [[frequentLines]] aggregate (distinct
    * lines only); pass 2 explodes the corpus and anti-joins the frequent
    * set with NO broadcast hint — AQE converts from the measured size
    * (the set is small by construction: <= total_lines / minDocFreq),
    * so a pathological threshold degrades to a shuffle join instead of
    * an executor OOM — then one reassembly shuffle on the doc id.
    */
  def removeFrequentLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDocFreq: Long): DataFrame = {
    val freq = frequentLines(df, textCol, minDocFreq).select(col("line"))
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "line")))
    val kept = lines.join(freq, Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("line")))),
          s => s("line")), "\n").as("text"),
        count(lit(1)).as("__kept"))
    df.select(col(idCol), size(split(col(textCol), "\n")).as("__total"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("text"), lit("")).as("text"),
        (col("__total") - coalesce(col("__kept"), lit(0L))).as("n_removed"))
  }

  /** Corpus rows with the Bloom hit flag attached: the probe set reduces
    * to a fixed-size filter (one aggregation job, run eagerly — the
    * [[Similarity.ivfTopK]] centroid precedent) that ships to executors
    * as a torrent broadcast, and the flag is a pure projection over the
    * corpus scan. Deliberately NOT the 1-row cross-join attachment: a
    * joined bloom column costs an O(numBits) `getBinary` copy per corpus
    * row before the probe can run — the broadcast-handle expression
    * ([[graft.functions.BloomMightContainBroadcast]]) probes a
    * once-per-executor parsed word array instead.
    */
  private def withBloomHit(
      corpus: DataFrame,
      probe: DataFrame,
      keyCol: String,
      numBits: Long,
      numHashFns: Int): DataFrame = {
    val bytes = probe.agg(graft.functions.bloom_agg(
      xxhash64(col(keyCol)), numBits, numHashFns).as("__bloom"))
      .head().getAs[Array[Byte]](0)
    val handle = corpus.sparkSession.sparkContext.broadcast(bytes)
    corpus.withColumn("__bloom_hit",
      graft.functions.bloom_might_contain_bcast(handle,
        xxhash64(col(keyCol))))
  }

  /** Bloom HIT candidates, persisted. The persist is not (only) a
    * recompute guard — it is an OPTIMIZER BARRIER: without it, Catalyst's
    * PushLeftSemiLeftAntiThroughJoin pushes the exact confirm semi/anti
    * join BELOW the Bloom condition, turning the plan back into a
    * full-corpus key shuffle and leaving the filter to run on the join
    * output — exactly backwards at scale. The cached frame is bounded by
    * true-match volume + the filter's designed FP rate, never corpus
    * size.
    */
  private def bloomHitsReleasable(
      corpus: DataFrame,
      probe: DataFrame,
      keyCol: String,
      numBits: Long,
      numHashFns: Int): (DataFrame, DataFrame, () => Unit) = {
    val flagged = withBloomHit(corpus, probe, keyCol, numBits, numHashFns)
    val hits = flagged.filter(col("__bloom_hit")).drop("__bloom_hit")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (flagged, hits, () => { hits.unpersist(blocking = false); () })
  }

  /** EXACT key-match decontamination, Bloom-accelerated: corpus rows
    * whose `keyCol` appears in `probe` (use the clean complement
    * [[bloomAntiJoin]] to drop them). The Bloom filter is a PREFILTER —
    * candidates that survive it are confirmed by an exact join, so the
    * answer carries no false positives and is SQL-oracle-equal to a plain
    * semi-join.
    *
    * Scale shape (the regime where the probe set is too big to broadcast
    * raw — a plain semi-join would then shuffle the ENTIRE corpus on the
    * key): the probe collapses to O(numBits) filter bytes via word-wise
    * OR merges (one fixed-size buffer per partition crosses the
    * exchange), broadcasts as one row, and the corpus scan drops
    * non-members map-side inside whole-stage codegen. Only Bloom HITS —
    * true matches plus the designed false-positive rate — are persisted
    * and reach the confirm join, so the join volume is bounded by match
    * volume, not corpus size (see [[bloomHitsReleasable]] for why the
    * persist is load-bearing).
    */
  def bloomSemiJoin(
      corpus: DataFrame,
      probe: DataFrame,
      keyCol: String,
      numBits: Long = 1L << 23,
      numHashFns: Int = 5): DataFrame =
    bloomSemiJoinReleasable(corpus, probe, keyCol, numBits, numHashFns)._1

  /** [[bloomSemiJoin]] plus a release() thunk that unpersists the cached
    * candidate frame (call once the result has been materialized).
    */
  def bloomSemiJoinReleasable(
      corpus: DataFrame,
      probe: DataFrame,
      keyCol: String,
      numBits: Long = 1L << 23,
      numHashFns: Int = 5): (DataFrame, () => Unit) = {
    val (_, hits, release) =
      bloomHitsReleasable(corpus, probe, keyCol, numBits, numHashFns)
    val confirmed = hits
      .join(probe.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      .select(corpus.columns.toIndexedSeq.map(col): _*)
    (confirmed, release)
  }

  /** Clean complement of [[bloomSemiJoin]]: corpus rows whose key does
    * NOT appear in the probe set — the decontaminated training corpus.
    *
    * Two branches, both cheap: Bloom MISSES are definitely clean (no
    * false negatives) and flow scan->output with NO exchange; Bloom hits
    * (match volume + FP rate, persisted — see [[bloomHitsReleasable]])
    * are the only rows that pay the exact anti-join. The corpus is
    * scanned twice but never shuffled — at scale two pruned columnar
    * scans cost far less than one full-corpus shuffle. If the corpus
    * frame is expensive to recompute (a join, not a scan), persist it
    * upstream.
    */
  def bloomAntiJoin(
      corpus: DataFrame,
      probe: DataFrame,
      keyCol: String,
      numBits: Long = 1L << 23,
      numHashFns: Int = 5): DataFrame =
    bloomAntiJoinReleasable(corpus, probe, keyCol, numBits, numHashFns)._1

  /** [[bloomAntiJoin]] plus a release() thunk for the cached candidates. */
  def bloomAntiJoinReleasable(
      corpus: DataFrame,
      probe: DataFrame,
      keyCol: String,
      numBits: Long = 1L << 23,
      numHashFns: Int = 5): (DataFrame, () => Unit) = {
    val (flagged, hits, release) =
      bloomHitsReleasable(corpus, probe, keyCol, numBits, numHashFns)
    val cleanMisses = flagged.filter(!col("__bloom_hit")).drop("__bloom_hit")
    val falsePositives = hits
      .join(probe.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .select(cleanMisses.columns.toIndexedSeq.map(col): _*)
    (cleanMisses.unionAll(falsePositives), release)
  }

  /** Repeated-span detection (the exact-substring dedup regime of
    * "Deduplicating Training Data Makes Language Models Better",
    * Lee et al. 2022, at token-window granularity): every
    * `windowTokens`-token window that occurs in >= `minDocs` DISTINCT
    * documents, with its document count. Complements
    * [[removeFrequentLines]] (which needs line structure) and
    * [[ngramContamination]] (cross-corpus): this finds verbatim repeated
    * passages WITHIN one corpus — licenses, headers, templated blocks —
    * that whole-doc dedup cannot see.
    *
    * Output: span (one exemplar text per duplicated window), n_docs.
    *
    * Scale shape: pass 1 explodes per-doc DISTINCT windows
    * ([[TextOps.ngrams]] dedupes inside the row) but projects them to
    * TWO independent 64-bit hashes before the exchange, so the only
    * full-corpus shuffle carries 24 bytes per (window, doc) pair — the
    * span text itself never crosses it. Counting groups on the 128-bit
    * hash pair: at corpus scale (~10^12 distinct windows) a single
    * 64-bit key WOULD collide and merge unrelated windows (expected
    * collisions ~ W^2/2^65); the pair pushes that to ~W^2/2^129,
    * negligible at any physical scale. Pass 2 regenerates windows
    * map-side and joins the duplicated-hash set (bounded by true
    * duplication volume, not corpus size — no broadcast hint, AQE
    * converts from the measured size) to recover one exemplar span text
    * per surviving hash.
    */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      minDocs: Long = 2): DataFrame = {
    require(windowTokens >= 1,
      s"windowTokens must be >= 1, got $windowTokens")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val Seed2 = 0x9E3779B97F4A7C15L
    // tokenize + window explode + double-hash is the heavy per-row
    // stage and BOTH consumers (count + exemplar fetch) re-run it off
    // the scan: spread an under-split source first (no-op at scale),
    // which also lets the consumers share one exchange instead of two
    // scans
    val src = Parallelism.spreadIfNarrow(
      df.select(col(idCol).as("__id"), col(textCol).as("__text")))
    def spanStream = src.select(col("__id"),
      explode(graft.ops.TextOps.ngrams(col("__text"), windowTokens))
        .as("span"))
    val dupHashes = spanStream
      .select(xxhash64(col("span")).as("__h1"),
        xxhash64(col("span"), lit(Seed2)).as("__h2"))
      .groupBy(col("__h1"), col("__h2"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    spanStream
      .select(xxhash64(col("span")).as("__h1"),
        xxhash64(col("span"), lit(Seed2)).as("__h2"), col("span"))
      .join(dupHashes, Seq("__h1", "__h2"))
      .groupBy(col("__h1"), col("__h2"))
      .agg(min(col("span")).as("span"), max(col("n_docs")).as("n_docs"))
      .select(col("span"), col("n_docs"))
  }

  /** Exact-substring REMOVAL — the action half of [[duplicatedSpans]]'
    * detection (Lee et al. "Deduplicating Training Data Makes Language
    * Models Better" regime): every `windowTokens`-token window that
    * repeats across >= `minDocs` documents is excised from EVERY
    * document. Flagged windows merge by position, so a boilerplate run
    * longer than one window is removed whole, and interleaved unique
    * text survives. Output: idCol, text (cleaned), n_removed (excised
    * token count).
    *
    * Scale shape: the frequent-window count is [[duplicatedSpans]]'
    * hash-only shuffle (two 64-bit hashes per distinct (window, doc) —
    * span text never shuffles); the flagged-position frame carries
    * (id, pos) pairs bounded by TRUE duplication volume, reduced to one
    * sorted position array per affected doc; the excision itself is a
    * row-local HOF rebuild (token kept iff no flagged window covers
    * it). Matching is by the same double-64-bit hash as
    * [[duplicatedSpans]] — a false removal needs a simultaneous 128-bit
    * collision. Two corpus scans by design (counting pass + rebuild
    * pass), the documented [[duplicatedSpans]] trade against a
    * corpus-sized persist.
    */
  def removeDuplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      minDocs: Long = 2): DataFrame = {
    require(windowTokens >= 1,
      s"windowTokens must be >= 1, got $windowTokens")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val Seed2 = 0x9E3779B97F4A7C15L
    def windows = df.select(col(idCol).as("__id"),
      posexplode(graft.ops.TextOps.allNgrams(col(textCol), windowTokens))
        .as(Seq("__pos", "__span")))
      .select(col("__id"), col("__pos"),
        xxhash64(col("__span")).as("__h1"),
        xxhash64(col("__span"), lit(Seed2)).as("__h2"))
    val dupHashes = windows
      .select(col("__id"), col("__h1"), col("__h2")).distinct()
      .groupBy(col("__h1"), col("__h2"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minDocs)
      .select(col("__h1"), col("__h2"))
    val flaggedPositions = windows
      .join(dupHashes, Seq("__h1", "__h2"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(col("__pos"))).as("__ps"))
    val toks = split(col(textCol), " ")
    val kept = filter(toks, (t, i) =>
      !exists(col("__ps"), p => i >= p && i < p + windowTokens))
    df.join(flaggedPositions, col(idCol) === col("__id"), "left")
      .select(col(idCol),
        when(col("__ps").isNull, col(textCol))
          .otherwise(array_join(kept, " ")).as(textCol),
        when(col("__ps").isNull, lit(0))
          .otherwise(size(toks) - size(kept)).as("n_removed"))
  }

  /** EXACT n-gram contamination (the GPT-3-style eval-set decontamination
    * rule: a probe doc is contaminated if it shares >= minShared distinct
    * token n-grams with a training doc). Complements
    * [[crossCorpusNearDups]]: that op finds FUZZY whole-doc near-dups via
    * MinHash; this one finds verbatim SPAN overlap — quotes, copied
    * passages, leaked test questions — that whole-doc similarity misses.
    *
    * Output: train_id, probe_id, shared_ngrams (count of distinct shared
    * n-grams).
    *
    * Scale shape: both sides are map-only explodes of row-local distinct
    * n-grams ([[TextOps.ngrams]]) meeting in ONE join on the gram string.
    * With broadcastProbe=true (the decontamination case: eval set <<
    * corpus) the probe gram stream broadcasts and the TRAINING CORPUS
    * NEVER SHUFFLES — the scan streams through a broadcast hash join and
    * only matching (train_id, probe_id) rows reach the aggregation
    * shuffle, which is bounded by true contamination volume, not corpus
    * size. Set broadcastProbe=false for corpus-vs-corpus runs; the join
    * then shuffles both gram streams on the gram key (n-grams are
    * near-unique, so the key space is huge and skew-free).
    *
    * hashGrams=true joins on xxhash64(gram) instead of the gram string:
    * an n=13 gram averages ~80 bytes, so the broadcast relation over a
    * large eval set shrinks ~5x (two 8-byte hashes) and join probes
    * become long-compares. Because the TRAIN side contributes ~10^12
    * distinct grams at corpus scale, a single 64-bit key would make a
    * cross-side collision — which INVENTS a contamination pair between
    * unrelated docs at minShared=1 — a realistic event (expected
    * spurious pairs ~ D_train x D_probe / 2^64). So matches are
    * confirmed against a SECOND independent 64-bit hash after the join:
    * a false pair then needs a simultaneous 128-bit collision
    * (~D_train x D_probe / 2^128, negligible at any physical scale).
    * Default stays exact-string (SQL-oracle-able).
    */
  def ngramContamination(
      train: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      minShared: Int = 1,
      broadcastProbe: Boolean = true,
      hashGrams: Boolean = false): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // second-seed confirmation hash: a join match must agree on both
    // independent 64-bit hashes, pushing false pairs out to 2^-128
    val Seed2 = 0x9E3779B97F4A7C15L
    def gramCols(g: Column, h2Name: String): Seq[Column] =
      if (hashGrams) Seq(xxhash64(g).as("gram"),
        xxhash64(g, lit(Seed2)).as(h2Name))
      else Seq(g.as("gram"))
    val tg = train.select(col(idCol).as("train_id"),
      explode(graft.ops.TextOps.ngrams(col(textCol), n)).as("__g"))
      .select(col("train_id") +: gramCols(col("__g"), "__h2t"): _*)
    val pgBase = probe.select(col(idCol).as("probe_id"),
      explode(graft.ops.TextOps.ngrams(col(textCol), n)).as("__g"))
      .select(col("probe_id") +: gramCols(col("__g"), "__h2p"): _*)
    val pg = if (broadcastProbe) broadcast(pgBase) else pgBase
    val joined = tg.join(pg, "gram")
    val confirmed =
      if (hashGrams) joined.filter(col("__h2t") === col("__h2p"))
      else joined
    confirmed
      .groupBy(col("train_id"), col("probe_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
  }

  def crossCorpusNearDups(
      corpus: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      maxBucketSize: Int = 10000): DataFrame =
    crossCorpusNearDupsReleasable(corpus, probe, idCol, textCol, threshold,
      numHashes, bands, shingleK, maxBucketSize)._1

  /** [[crossCorpusNearDups]] plus a release() thunk that unpersists the
    * cached intermediates (same contract as
    * [[minHashLshPairsReleasable]]: caches are keyed by logical plan, call
    * release() once the returned plan has been materialized).
    *
    * Scale shape of the verify step: nothing corpus-sized is ever
    * persisted or shuffled. The candidate PAIR frame (ids only) is the
    * single cached product of the LSH stage; the exact-Jaccard verify
    * re-reads texts from the source scan filtered by a BROADCAST semi-join
    * on the candidate-id set, so only candidate texts are materialized,
    * and the two payload joins stream that small frame — the corpus text
    * column never crosses an exchange. (Candidate count is bounded by the
    * band/bucket caps; if the caller's corpus frame is itself expensive to
    * recompute — a join, not a scan — persist it upstream.)
    */
  def crossCorpusNearDupsReleasable(
      corpus: DataFrame,
      probe: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      maxBucketSize: Int = 10000): (DataFrame, () => Unit) = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val a = corpus.select((col(idCol).cast("long") * 2).as("id"),
      col(textCol).as("__text"))
    val b = probe.select((col(idCol).cast("long") * 2 + 1).as("id"),
      col(textCol).as("__text"))
    val all = a.unionAll(b)
    // signatures now have TWO consumers — the bucket-size probe inside
    // [[cappedBucketPairs]] and the banding pass — so the shingle/hash
    // pipeline persists (id + numHashes longs per doc, tiny next to the
    // corpus) instead of recomputing per consumer
    val sig = minHashSignatures(all, "id", "__text", numHashes, shingleK)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = sig.select(col("id"),
      posexplode(graft.functions.band_hashes(col("sig"), bands))
        .as(Seq("band", "bucket")))

    // candidate id pairs: the ONLY cached product of the LSH stage
    // (two longs per candidate — bounded by the bucket cap, tiny next to
    // the corpus). Consumed three times: candidate-id broadcast + both
    // payload joins.
    val pairs = cappedBucketPairs(banded, Seq("band", "bucket"), "id",
      maxBucketSize)
      .filter(pmod(col("id_a"), lit(2)) =!= pmod(col("id_b"), lit(2)))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__nbands"))
      .drop("__nbands")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // verify texts: re-read the source scan (map-only projection) filtered
    // to candidate ids via a broadcast LeftSemi — the corpus is scanned,
    // never shuffled, and only candidate texts survive into the cache.
    // No distinct: the broadcast hash relation dedupes keys itself, and
    // skipping it saves a shuffle stage on the candidate-id frame.
    val candIds = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
    val candTexts = all.join(broadcast(candIds), Seq("id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val result = pairs
      .join(candTexts.select(col("id").as("id_a"), col("__text").as("text_a")),
        Seq("id_a"))
      .join(candTexts.select(col("id").as("id_b"), col("__text").as("text_b")),
        Seq("id_b"))
      .select(
        shiftright(when(pmod(col("id_a"), lit(2)) === 0, col("id_a"))
          .otherwise(col("id_b")), 1).as("corpus_id"),
        shiftright(when(pmod(col("id_a"), lit(2)) === 1, col("id_a"))
          .otherwise(col("id_b")), 1).as("probe_id"),
        ngramJaccard(col("text_a"), col("text_b"), shingleK).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    (result, () => {
      sig.unpersist(blocking = false)
      pairs.unpersist(blocking = false)
      candTexts.unpersist(blocking = false)
      ()
    })
  }

  /** Connected components over candidate pairs: assigns every id the
    * minimum id reachable in its component — the cluster-assignment step
    * that turns near-dup PAIRS into dedup groups (keep min id, drop the
    * rest). Large-star/small-star edge contraction (the MapReduce CC
    * algorithm of Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): each round rewires every node's larger neighbors
    * to its neighborhood minimum (large-star), then its smaller ones
    * (small-star); the edge set contracts toward a union of stars rooted
    * at component minima in O(log^2 n) rounds worst case (~log n
    * observed — a 200-node path closes in well under 10). Unlike plain
    * min-label propagation, convergence does NOT depend on component
    * diameter. Each half-round is one map-side-combinable aggregate plus
    * one equi-join on the same key. Throws if the fixpoint is not
    * reached within `maxIter` (a silent non-converged result would
    * mislabel components).
    */
  def connectedComponents(
      pairs: DataFrame,
      idColA: String = "id_a",
      idColB: String = "id_b",
      maxIter: Int = 20): DataFrame =
    connectedComponentsReleasable(pairs, idColA, idColB, maxIter)._1

  /** [[connectedComponents]] plus a release() thunk that unpersists the
    * returned labels (they stay cached because downstream consumers join
    * against them; recomputing the label fixpoint through lineage after
    * release is expensive — release only when done with the result).
    */
  def connectedComponentsReleasable(
      pairs: DataFrame,
      idColA: String = "id_a",
      idColB: String = "id_b",
      maxIter: Int = 20): (DataFrame, () => Unit) = {
    val (df, release, _) =
      connectedComponentsStats(pairs, idColA, idColB, maxIter)
    (df, release)
  }

  /** [[connectedComponentsReleasable]] plus the number of rounds the
    * fixpoint took (the loop is eager, so the count is exact) — lets
    * callers and specs pin the O(log diameter) bound.
    */
  /** m(u) = min(Γ(u) ∪ {u}) per node, attached back to each edge row.
    * groupBy + equi-join on the SAME key (both map-side combinable /
    * colocated) rather than a window, so a mega-star center never
    * funnels its whole neighbor list through one task.
    */
  private def withNeighborhoodMin(sym: DataFrame): DataFrame = {
    val mins = sym.groupBy(col("src")).agg(min(col("dst")).as("__nmin"))
      .select(col("src").as("__u"), least(col("__u"), col("__nmin")).as("__m"))
    sym.join(mins, col("src") === col("__u")).drop("__u")
  }

  /** Large-star: every neighbor LARGER than u re-points to m(u). */
  private def largeStarRound(e: DataFrame): DataFrame = {
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
    withNeighborhoodMin(sym)
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("__m").as("dst"))
      .distinct()
  }

  /** Small-star: orient edges toward the smaller endpoint, then every
    * smaller neighbor (and u itself) re-points to m(u).
    */
  private def smallStarRound(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("src"), col("dst")).as("src"),
      least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    val withM = withNeighborhoodMin(oriented)
    withM.select(col("dst").as("src"), col("__m").as("dst"))
      .unionAll(withM.select(col("src"), col("__m").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  def connectedComponentsStats(
      pairs: DataFrame,
      idColA: String = "id_a",
      idColB: String = "id_b",
      maxIter: Int = 20): (DataFrame, () => Unit, Int) = {
    val initial = pairs
      .select(col(idColA).as("src"), col(idColB).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val allIds = initial
      .select(col("src").as("id"))
      .unionAll(initial.select(col("dst").as("id")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the edge set is consumed several times per round — truncate lineage
    // each round (eager localCheckpoint) or the logical plan grows
    // exponentially in rounds and the driver dies building plan strings
    // long before any data moves
    var e = initial.localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStarRound(largeStarRound(e)).localCheckpoint(true)
      // fixpoint when the edge set stops changing: compare (count,
      // order-independent xor-hash) — one aggregate per side, no
      // except/join (xor: overflow-free, and the edge set is distinct so
      // duplicates cannot cancel)
      def sig(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)),
          expr("bit_xor(xxhash64(src, dst))")).first()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      converged = sig(next) == sig(e)
      e = next
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "raise maxIter (star contraction needs ~log2(n) rounds)")
    // at the fixpoint e is a union of stars: every member points at its
    // component min; centers (and nothing else) appear only as dst.
    // Isolated self-pairs were dropped up front, so label them (and the
    // centers) from the id universe with comp = id.
    val members = e.select(col("src").as("id"), col("dst").as("comp"))
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
    val out = allIds
      .join(members, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    allIds.unpersist(blocking = false)
    (out, () => { out.unpersist(blocking = false); () }, iter)
  }

  /** One-row dedup YIELD report — the operational summary every dedup
    * run publishes before anyone deletes anything: corpus size, docs
    * touched by near-dup pairs, duplicate-cluster count and largest
    * cluster, and the keep-one-per-cluster drop count/fraction.
    * Clusters come from [[connectedComponents]] (star contraction over
    * the PAIR set only — the corpus pays one left join and two
    * aggregates); pair ids outside the corpus are ignored (the report
    * is corpus-scoped). Output: n_docs, n_in_pairs, n_clusters,
    * max_cluster_size, n_dropped, drop_frac, n_survivors.
    */
  def dedupYield(
      corpus: DataFrame, idCol: String, pairs: DataFrame,
      idColA: String = "id_a", idColB: String = "id_b"): DataFrame = {
    val (labels, release) =
      connectedComponentsReleasable(pairs, idColA, idColB)
    val joined = corpus
      .select(col(idCol).cast("long").as("id"))
      .join(labels.select(col("id"), col("comp").as("__comp")),
        Seq("id"), "left")
      .select(col("id"), col("__comp").isNotNull.as("in_pairs"),
        coalesce(col("__comp"), col("id")).as("comp"))
    val totals = joined.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("in_pairs"), 1L).otherwise(0L)).as("n_in_pairs"))
    val clusters = joined.groupBy(col("comp"))
      .agg(count(lit(1)).as("__sz"))
      .filter(col("__sz") >= 2)
      .agg(
        count(lit(1)).as("n_clusters"),
        coalesce(max(col("__sz")), lit(1L)).as("max_cluster_size"),
        coalesce(sum(col("__sz") - 1), lit(0L)).as("n_dropped"))
    val out = totals.crossJoin(broadcast(clusters))
      .select(col("n_docs"), col("n_in_pairs"), col("n_clusters"),
        col("max_cluster_size"), col("n_dropped"),
        when(col("n_docs") > 0,
          col("n_dropped").cast("double") / col("n_docs"))
          .otherwise(0.0).as("drop_frac"),
        (col("n_docs") - col("n_dropped")).as("n_survivors"))
    // the labels cache only serves this report's two consumers — the
    // single output row is materialized eagerly so release is safe here
    val row = out.collect()
    release()
    corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(row: _*), out.schema)
  }

  /** 64-bit SimHash over word tokens: per-bit majority of token hashes.
    * One monolithic codegen-era expression ([[graft.functions.SimHash64]]):
    * tokenize + hash + all 64 bit-votes in a single scan of the text (the
    * HOF composition re-walked the token-hash array once per bit).
    */
  def simHash(text: Column): Column = graft.functions.simhash64(text)

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Text near-duplicate pairs by SimHash Hamming distance — the text
    * twin of [[Media.imageHashNearDups]], sharing its routed engine
    * (exact multi-index-hashing recall at `maxHamming <= 15` — lazy,
    * any corpus size; a measured-count bounded broadcast scan at
    * `maxHamming >= 16`, eager and refusing past `bruteThreshold`).
    * One 8-byte fingerprint per document crosses the shuffle — the
    * cheapest near-dup modality by state; [[minHashLshPairs]] remains
    * the higher-recall shingle-level path when edit-distance-style
    * rewrites must still pair. Returns (id_a, id_b, hamming) with
    * id_a < id_b.
    */
  def simHashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 10000,
      bruteThreshold: Long = 100000L): DataFrame =
    simHashNearDupsReleasable(df, idCol, textCol, maxHamming,
      maxBucketSize, bruteThreshold)._1

  /** [[simHashNearDups]] plus a release() thunk for the persisted
    * fingerprint intermediate.
    */
  def simHashNearDupsReleasable(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000,
      bruteThreshold: Long = 100000L): (DataFrame, () => Unit) =
    Media.bandedHammingPairsReleasable(
      df.select(col(idCol).cast("long").as("id"),
        simHash(col(textCol)).as("h")),
      maxHamming, maxBucketSize, bruteThreshold)

  /** Persist a reference corpus's SimHash LSH buckets as a CorpusStore
    * table — incremental TEXT dedup by 8-byte fingerprint, the cheapest
    * member of the stored-screen family ([[writeMinHashReference]] is
    * the higher-recall shingle-level sibling;
    * [[Media.writePHashReference]] the image twin): fingerprint + band
    * the historical documents ONCE into `<table>_buckets`
    * (bb, id, h — the hash rides each of its 4 band rows, no second
    * fetch join); each new batch probes with [[simHashNearDupsStored]]
    * and only batch-derived rows shuffle. Oversized (boilerplate)
    * buckets drop at write time.
    */
  def writeSimHashReference(
      reference: DataFrame, idCol: String, textCol: String,
      table: String, numBuckets: Int = 16,
      maxBucketSize: Int = 10000): Unit =
    Media.writeHashReferenceRows(
      Media.bandedStoreRows(reference.select(
        col(idCol).cast("long").as("id"),
        simHash(col(textCol)).as("h"))),
      table, numBuckets, maxBucketSize)

  /** GROW a SimHash store with a new batch (screen first — ids are
    * assumed fresh); history never rewrites.
    */
  def appendSimHashReference(
      docs: DataFrame, idCol: String, textCol: String,
      table: String): Unit = {
    val n = graft.io.CorpusStore
      .storedNumBuckets(docs.sparkSession, s"${table}_buckets")
    graft.io.CorpusStore.appendBucketed(
      Media.bandedStoreRows(docs.select(
        col(idCol).cast("long").as("id"),
        simHash(col(textCol)).as("h"))),
      s"${table}_buckets", "bb", n, Seq("bb"))
  }

  /** Near-duplicate (new doc, stored doc) pairs by SimHash Hamming
    * distance against a [[writeSimHashReference]] store: the batch
    * fingerprints row-locally, its band rows probe the bucketed stored
    * scan (the store never re-exchanges), and the exact bit_count
    * verify decides. Recall is exact for `maxHamming` <= 15 by the
    * multi-index-hashing pigeonhole ([[Media.bandedProbeRows]] — wider
    * radii expand PROBE keys; the store never rewrites). Output:
    * new_id, ref_id, hamming.
    */
  def simHashNearDupsStored(
      docs: DataFrame, table: String, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val probe = Media.bandedProbeRows(docs.select(
      col(idCol).cast("long").as("id"),
      simHash(col(textCol)).as("h")), maxHamming)
      .select(col("id").as("new_id"), col("h").as("h_new"), col("bb"))
    val ref = graft.io.CorpusStore
      .readBucketed(docs.sparkSession, s"${table}_buckets")
    probe.join(ref, Seq("bb"))
      .select(col("new_id"), col("id").as("ref_id"),
        col("h_new"), col("h").as("h_ref"))
      .distinct() // hashes are functions of the ids -> this dedupes
                  // multi-band/probe collisions of the same pair
      .select(col("new_id"), col("ref_id"),
        bit_count(col("h_new").bitwiseXOR(col("h_ref"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity between two texts (set semantics over
    * word k-shingles): |A n B| / |A u B|.
    */
  def ngramJaccard(textA: Column, textB: Column, k: Int): Column = {
    val a = wordShingles(textA, k)
    val b = wordShingles(textB, k)
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union > 0, inter / union).otherwise(0.0)
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, candidates
    * generated by MULTI-BAND random-hyperplane LSH: `bands` independent
    * buckets of `signBits` sign bits each; a pair is a candidate when it
    * collides in >=1 band. Banding amplifies recall — for cosine c the
    * per-pair miss probability is (1-(1-acos(c)/pi)^signBits)^bands, which
    * for near-dup thresholds is negligible at bands>=8.
    *
    * Same scale shape as [[minHashLshPairs]]: one codegen scan computes all
    * band buckets ([[graft.functions.HyperplaneBands]]), the bucket
    * self-join carries ids only, oversized buckets are dropped, pairs
    * dedupe before the embeddings are fetched for the exact-cosine verify.
    *
    * The banded frame persists for the bucket-size probe (plan-keyed
    * cache); this plain variant never releases it — long-lived sessions
    * processing many distinct corpora should use
    * [[embeddingNearDupsReleasable]] and release when done.
    */
  def embeddingNearDups(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      signBits: Int = 8,
      bands: Int = 8,
      maxBucketSize: Int = 10000): DataFrame =
    embeddingNearDupsReleasable(df, idCol, embCol, threshold, signBits,
      bands, maxBucketSize)._1

  /** [[embeddingNearDups]] plus a release() thunk for the cached banded
    * frame (the [[minHashLshPairsReleasable]] contract): the hyperplane
    * banding pass over every embedding has two consumers — the
    * bucket-size probe inside [[cappedBucketPairs]] and the pair
    * generation — so the (band, bucket, id) rows persist and the
    * corpus-wide hyperplane projections compute exactly once.
    */
  def embeddingNearDupsReleasable(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      signBits: Int = 8,
      bands: Int = 8,
      maxBucketSize: Int = 10000): (DataFrame, () => Unit) = {
    val dims = Similarity.dim(df, embCol)
    val planes = Similarity.randomPlanes(bands * signBits, dims)
    val base = df.select(col(idCol).as("id"), col(embCol).as("emb"))

    val banded = base.select(col("id"),
      posexplode(graft.functions.hyperplane_bands(col("emb"), planes, signBits))
        .as(Seq("band", "bucket")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // same salted bucket -> cap -> lazy pair generation shape as
    // minHashLshPairs
    val pairs = cappedBucketPairs(banded, Seq("band", "bucket"), "id",
      maxBucketSize)
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("__nbands"))
      .drop("__nbands")

    val result = pairs
      .join(base.select(col("id").as("id_a"), col("emb").as("emb_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("emb").as("emb_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
    (result, () => { banded.unpersist(blocking = false); () })
  }

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023):
    * k-means-cluster the embedding space, then compare pairs ONLY within
    * a cluster — near-duplicates land in the same cell, so the quadratic
    * work shrinks from corpus² to Σ cluster², the paper's core trick.
    * Returns (id_a, id_b, cosine) with id_a < id_b and cosine >= the
    * threshold.
    *
    * Scale shape: centroid fit is [[Similarity.fitCentroids]] (map-only
    * passes + nCentroids-row aggregates); assignment is one codegen
    * expression over the codebook (literal or torrent-broadcast — no
    * join); then ONE cluster-keyed shuffle groups ids. In-cluster
    * pairing uses the lazy pair generator, and `maxClusterSize` bounds
    * the quadratic cell work exactly like the LSH bucket cap — at 100 TB
    * nCentroids must grow with the corpus (cells of ~10⁴ docs), which is
    * a parameter, not a plan change. Only candidate pairs fetch
    * embeddings back (two AQE-sized joins on the bounded pair frame);
    * the corpus embedding frame itself never shuffles.
    */
  /** Plain variant of [[semDedupPairsReleasable]]: the cluster-assignment
    * frame it persists (plan-keyed cache) is never released here —
    * long-lived sessions should use the Releasable variant.
    */
  def semDedupPairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      nCentroids: Int = 16,
      iterations: Int = 2,
      maxClusterSize: Int = 10000,
      centroidBroadcastThreshold: Int = 1024): DataFrame =
    semDedupPairsReleasable(df, idCol, embCol, threshold, nCentroids,
      iterations, maxClusterSize, centroidBroadcastThreshold)._1

  /** [[semDedupPairs]] plus a release() thunk for the cached
    * cluster-assignment frame (the [[minHashLshPairsReleasable]]
    * contract): scoring every embedding against the codebook has two
    * consumers — the bucket-size probe inside [[cappedBucketPairs]] and
    * the pair generation — so the (cluster_id, id) rows persist and the
    * assignment pass computes exactly once.
    */
  def semDedupPairsReleasable(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      nCentroids: Int = 16,
      iterations: Int = 2,
      maxClusterSize: Int = 10000,
      centroidBroadcastThreshold: Int = 1024): (DataFrame, () => Unit) = {
    val base = df.select(col(idCol).as("id"),
      col(embCol).cast("array<double>").as("emb"))
    val centroids = Similarity.fitCentroids(
      base.select(col("id").as("item_id"), col("emb").as("item_emb")),
      nCentroids, iterations, centroidBroadcastThreshold)
    // empty corpus -> no centroids to assign against; no pairs, by
    // construction, rather than a zero-length-codebook error
    if (centroids.isEmpty)
      return (base.select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0.0).as("cosine")).limit(0), () => ())
    val assign = Similarity.assignTopCentroids(
      df.sparkSession.sparkContext, centroidBroadcastThreshold) _
    val assigned = base
      .select(assign(col("emb"), centroids, 1)(0).as("cluster_id"),
        col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // clusters partition the corpus: every pair appears in exactly one
    // cell, so no cross-band dedupe pass is needed (unlike LSH)
    val pairs = cappedBucketPairs(assigned,
      Seq("cluster_id"), "id", maxClusterSize)
    val result = pairs
      .join(base.select(col("id").as("id_a"), col("emb").as("emb_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("emb").as("emb_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
    (result, () => { assigned.unpersist(blocking = false); () })
  }

  /** The curation-side view of [[semDedupPairs]]: the input rows that
    * SURVIVE semantic dedup under the deterministic keep-lowest-id rule —
    * a row is dropped iff some LOWER-id row in its cluster matches it at
    * `threshold` (clusters are ε-balls, near-cliques in practice, so
    * keep-lowest ≈ one representative per duplicate group). Survivors
    * come back by anti-join on the dropped-id side, which is bounded by
    * the candidate pair set (AQE picks the strategy); full row payload
    * and column order are preserved.
    *
    * This plain variant never releases the persisted cluster-assignment
    * cache — long-lived sessions should use
    * [[semDedupSurvivorsReleasable]].
    */
  def semDedupSurvivors(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      nCentroids: Int = 16,
      iterations: Int = 2,
      maxClusterSize: Int = 10000,
      centroidBroadcastThreshold: Int = 1024): DataFrame =
    semDedupSurvivorsReleasable(df, idCol, embCol, threshold, nCentroids,
      iterations, maxClusterSize, centroidBroadcastThreshold)._1

  /** [[semDedupSurvivors]] plus the release() thunk of the underlying
    * [[semDedupPairsReleasable]] cluster-assignment cache.
    */
  def semDedupSurvivorsReleasable(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      nCentroids: Int = 16,
      iterations: Int = 2,
      maxClusterSize: Int = 10000,
      centroidBroadcastThreshold: Int = 1024): (DataFrame, () => Unit) = {
    val (pairs, release) = semDedupPairsReleasable(df, idCol, embCol,
      threshold, nCentroids, iterations, maxClusterSize,
      centroidBroadcastThreshold)
    val dropped =
      pairs.select(col("id_b").as(idCol)) // id_a < id_b: the higher id drops
    (df.join(dropped, Seq(idCol), "left_anti")
      .select(df.columns.map(col).toIndexedSeq: _*), release)
  }

  /** Persist a reference corpus's distinct normalized-text fingerprints
    * ([[TextOps.fingerprint]]) as a bucketed store table — the EXACT
    * half of incremental ingest dedup (the fuzzy half is
    * [[writeMinHashReference]]): pay the reference's fingerprint +
    * distinct + shuffle once, then screen every new batch — or STREAM,
    * see [[filterUnseenAgainstStore]] — against it with the stored side
    * scanning bucketed and exchange-free.
    */
  def writeFingerprintReference(
      reference: DataFrame,
      textCol: String,
      table: String,
      numBuckets: Int): Unit =
    graft.io.CorpusStore.writeBucketed(
      reference.select(TextOps.fingerprint(col(textCol)).as("fp"))
        .distinct(),
      table, "fp", numBuckets, Seq("fp"))

  /** GROW a fingerprint store with a screened batch: the fingerprints
    * of `docs` not already present append to the table (anti-join
    * dedup keeps the store distinct; the history is never rewritten —
    * each ingest writes only its own per-bucket files). The canonical
    * ingest loop is screen ([[filterUnseenAgainstStore]]) → process →
    * append.
    */
  def appendFingerprints(
      docs: DataFrame,
      table: String,
      textCol: String): Unit = {
    val spark = docs.sparkSession
    val n = graft.io.CorpusStore.storedNumBuckets(spark, table)
    val fresh = docs
      .select(TextOps.fingerprint(col(textCol)).as("fp")).distinct()
      .join(graft.io.CorpusStore.readBucketed(spark, table),
        Seq("fp"), "left_anti")
    graft.io.CorpusStore.appendBucketed(fresh, table, "fp", n, Seq("fp"))
  }

  /** Rows of `docs` whose normalized-text fingerprint does NOT appear
    * in a [[writeFingerprintReference]] store — a STATELESS left-anti
    * join against the static bucketed table, so the same call works on
    * a batch frame and on a STREAMING frame (stream-static anti joins
    * need no state store and no watermark; Spark recomputes nothing on
    * the static side beyond the bucketed scan). All input columns pass
    * through untouched.
    */
  def filterUnseenAgainstStore(
      docs: DataFrame,
      table: String,
      textCol: String): DataFrame = {
    val ref = graft.io.CorpusStore
      .readBucketed(docs.sparkSession, table)
    docs.join(ref, TextOps.fingerprint(col(textCol)) === col("fp"),
      "left_anti")
  }

  /** Persist a reference corpus's MinHash-LSH index as CorpusStore
    * bucketed tables, for INCREMENTAL near-dup screening: dedup every
    * new batch against the historical corpus without recomputing or
    * re-exchanging the history. Two tables are written:
    *
    *  - `<table>_buckets` (bb, id): one row per (band-bucket, doc),
    *    bb = xxhash64(band, band-hash) so the probe join key is a
    *    single column the store can bucket on. Buckets larger than
    *    `maxBucketSize` (boilerplate shingles) are dropped at WRITE
    *    time, so no probe ever pays their quadratic fan-out.
    *  - `<table>_sigs` (id, sig): the signatures, bucketed by id, so
    *    the verification join fetches them without the store re-
    *    exchanging.
    *
    * At 100 TB this is the structural win of the store: the reference
    * pays shingling + signatures + the bucket shuffle ONCE, at write
    * time; every subsequent batch shuffles only its own (tiny) bands.
    * Probe with [[minHashNearDupsStored]] using the SAME numHashes /
    * bands / shingleK.
    */
  def writeMinHashReference(
      reference: DataFrame,
      idCol: String,
      textCol: String,
      table: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      numBuckets: Int = 64,
      maxBucketSize: Int = 10000): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val sig = minHashSignatures(reference, idCol, textCol, numHashes,
      shingleK).filter(col("sig").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val buckets = sig.select(col("id"),
        posexplode(graft.functions.band_hashes(col("sig"), bands))
          .as(Seq("band", "bucket")))
        .select(col("id"), xxhash64(col("band"), col("bucket")).as("bb"))
      // write-time cap: the oversized-bucket list is boilerplate-sized
      // (few distinct degenerate shingles), so it broadcasts
      val oversized = buckets.groupBy(col("bb"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucketSize)
        .select(col("bb"), lit(1).as("__drop"))
      val kept = buckets
        .join(broadcast(oversized), Seq("bb"), "left")
        .filter(col("__drop").isNull).drop("__drop")
      graft.io.CorpusStore.writeBucketed(kept, s"${table}_buckets",
        "bb", numBuckets, Seq("bb"))
      graft.io.CorpusStore.writeBucketed(sig, s"${table}_sigs",
        "id", numBuckets, Seq("id"))
    } finally { sig.unpersist(blocking = false); () }
  }

  /** GROW a MinHash store with a new batch: band buckets and
    * signatures of `docs` append to the two tables (ids are assumed
    * fresh — screen first, the ingest contract). The write-time bucket
    * cap applies per append batch; [[minHashNearDupsStored]] re-applies
    * the cap at READ time so cross-batch growth cannot restore the
    * quadratic fan-out, and a store ingesting adversarial boilerplate
    * for many batches should still periodically re-write with
    * [[writeMinHashReference]] (or compact via
    * [[graft.io.CorpusStore.compact]]) to shed the dead rows.
    */
  def appendMinHashReference(
      docs: DataFrame,
      table: String,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      maxBucketSize: Int = 10000): Unit = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val spark = docs.sparkSession
    val nb = graft.io.CorpusStore
      .storedNumBuckets(spark, s"${table}_buckets")
    val ns = graft.io.CorpusStore.storedNumBuckets(spark, s"${table}_sigs")
    val sig = minHashSignatures(docs, idCol, textCol, numHashes, shingleK)
      .filter(col("sig").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val buckets = sig.select(col("id"),
        posexplode(graft.functions.band_hashes(col("sig"), bands))
          .as(Seq("band", "bucket")))
        .select(col("id"), xxhash64(col("band"), col("bucket")).as("bb"))
      val oversized = buckets.groupBy(col("bb"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucketSize)
        .select(col("bb"), lit(1).as("__drop"))
      val kept = buckets.join(broadcast(oversized), Seq("bb"), "left")
        .filter(col("__drop").isNull).drop("__drop")
      graft.io.CorpusStore.appendBucketed(kept, s"${table}_buckets",
        "bb", nb, Seq("bb"))
      graft.io.CorpusStore.appendBucketed(sig, s"${table}_sigs",
        "id", ns, Seq("id"))
    } finally { sig.unpersist(blocking = false); () }
  }

  /** Near-duplicate pairs between a new batch and a
    * [[writeMinHashReference]] store: (new_id, ref_id, est_jaccard)
    * for every stored document whose estimated Jaccard with a batch
    * document reaches `threshold`. Candidates come from the band-
    * bucket join against `<table>_buckets` (the stored side scans
    * bucketed — exchange-free, plan-pinned in StoredMinHashSpec); each
    * unique candidate pair then fetches its two signatures once (the
    * stored side from `<table>_sigs`, again without re-exchanging) and
    * the match-count estimate decides. Only batch-derived rows ever
    * shuffle. Pass the SAME numHashes / bands / shingleK as at write
    * time — signature layouts must agree for the estimate to mean
    * anything.
    *
    * `maxBucketSize` re-applies the write-time mega-bucket cap AT READ
    * TIME: [[appendMinHashReference]] caps only within each append
    * batch, so a boilerplate bucket can grow past the cap across many
    * appends — without this guard that silently restores the quadratic
    * candidate fan-out the cap exists to prevent.
    *
    * The batch-signature intermediate stays persisted until the
    * session drops it; sessions probing many batches should use
    * [[minHashNearDupsStoredReleasable]] and release after
    * materializing.
    */
  def minHashNearDupsStored(
      docs: DataFrame,
      table: String,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      threshold: Double = 0.8,
      maxBucketSize: Int = 10000): DataFrame =
    minHashNearDupsStoredReleasable(docs, table, idCol, textCol,
      numHashes, bands, shingleK, threshold, maxBucketSize)._1

  /** [[minHashNearDupsStored]] plus a release() thunk for the cached
    * batch-signature intermediate (the [[minHashLshPairsReleasable]]
    * contract).
    */
  def minHashNearDupsStoredReleasable(
      docs: DataFrame,
      table: String,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      threshold: Double = 0.8,
      maxBucketSize: Int = 10000): (DataFrame, () => Unit) = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val spark = docs.sparkSession
    val sig = minHashSignatures(docs, idCol, textCol, numHashes, shingleK)
      .filter(col("sig").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probe = sig.select(col("id").as("new_id"),
      posexplode(graft.functions.band_hashes(col("sig"), bands))
        .as(Seq("band", "bucket")))
      .select(col("new_id"), xxhash64(col("band"), col("bucket")).as("bb"))
    val refAll = graft.io.CorpusStore
      .readBucketed(spark, s"${table}_buckets")
    // read-time mega-bucket guard: measure CURRENT bucket sizes (the
    // count aggregates on the stored bucketing — no exchange) and drop
    // buckets past the cap before the candidate join; the oversized
    // list is boilerplate-sized, so it broadcasts
    val oversized = refAll.groupBy(col("bb"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select(col("bb"), lit(1).as("__drop"))
    val refBuckets = refAll
      .join(broadcast(oversized), Seq("bb"), "left")
      .filter(col("__drop").isNull).drop("__drop")
    val cand = probe.join(refBuckets, Seq("bb"))
      .groupBy(col("new_id"), col("id").as("ref_id"))
      .agg(count(lit(1)).as("__nb")).drop("__nb")
    val refSigs = graft.io.CorpusStore.readBucketed(spark, s"${table}_sigs")
      .select(col("id").as("ref_id"), col("sig").as("__sig_ref"))
    val result = cand
      .join(refSigs, Seq("ref_id"))
      .join(sig.select(col("id").as("new_id"), col("sig").as("__sig_new")),
        Seq("new_id"))
      .select(col("new_id"), col("ref_id"),
        (graft.functions.vec_match_count(col("__sig_ref"), col("__sig_new"))
          .cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
    (result, () => { sig.unpersist(blocking = false); () })
  }
}
