package graft.python

import java.{util => ju}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.io.ProfileUpload
import graft.ops.AutoSegmentation
import graft.profile.ProfileSession

/** Py4J-friendly profiling session for the Python facade.
  *
  * The reference ships a PySpark wrapper whose gateway calls are plain-Java
  * shaped: `jvm.com.whylogs.spark.WhyLogs.newProfilingSession(jdf, name)`
  * then `.withTimeColumn(str)` / `.groupBy(java.util.List)` /
  * `.withClassificationModel(p, t, s)` / `.aggProfiles(timestampMs)`
  * (/root/reference/spark/python/whyspark/udt/profile.py:82-98,
  * WhyLogs.scala:57-125). [[graft.profile.ProfileSession]] is idiomatic
  * Scala (varargs, Option, default args) which Py4J cannot call, so this
  * wrapper re-exposes it with monomorphic Java signatures. Every method is
  * a pure builder returning a new wrapper; all execution stays in
  * [[ProfileSession]] — one groupBy+agg pass, sketch-bounded state.
  */
class PyProfileSession private[python] (val session: ProfileSession) {

  def withTimeColumn(timeColumn: String): PyProfileSession =
    new PyProfileSession(session.withTimeColumn(timeColumn))

  /** Time bucketing with an explicit cadence (e.g. "1 hour"). The reference
    * expects callers to pre-truncate; we expose the windowed generalization.
    */
  def withTimeColumn(timeColumn: String, cadence: String): PyProfileSession =
    new PyProfileSession(session.withTimeColumn(timeColumn, cadence))

  def groupBy(columns: ju.List[String]): PyProfileSession =
    new PyProfileSession(session.groupBy(columns.asScala.toSeq: _*))

  /** scoreField == null or "" tracks the score-less confusion matrix, like
    * the reference's null-score ModelProfileSession (WhyLogs.scala:22-27).
    */
  def withClassificationModel(predictionField: String, targetField: String,
      scoreField: String): PyProfileSession =
    new PyProfileSession(session.withClassificationModel(
      predictionField, targetField,
      Option(scoreField).filter(_.nonEmpty)))

  def withRegressionModel(predictionField: String,
      targetField: String): PyProfileSession =
    new PyProfileSession(session.withRegressionModel(predictionField, targetField))

  def withTag(key: String, value: String): PyProfileSession =
    new PyProfileSession(session.withTag(key, value))

  /** Expand nested struct/array/map columns into profile-able leaves
    * (dotted struct paths, element + size profiles) — see
    * [[ProfileSession.flattenNested]].
    */
  def flattenNested(): PyProfileSession =
    new PyProfileSession(session.flattenNested())

  def withMetadata(key: String, value: String): PyProfileSession =
    new PyProfileSession(session.withMetadata(key, value))

  /** The typed profile frame: one row per group/window, one queryable
    * profile struct per column ([[graft.profile.ProfileSchema.schema]]).
    */
  def aggProfiles(): DataFrame = session.aggProfiles()

  /** The reference contract: "a DataFrame with aggregated profiles under
    * 'why_profile' column" (WhyLogs.scala:108-114) — the typed frame plus
    * the wire-format `DatasetProfileMessage` bytes stamped with the session
    * timestamp.
    */
  def aggProfiles(timestampMs: Long): DataFrame =
    session.exportProto(timestampMs)

  /** Profile and write the typed frame to parquet (whyspark's aggParquet,
    * profile.py:100-108).
    */
  def aggParquet(path: String): Unit =
    session.aggProfiles().write.parquet(path)

  /** Profile and upload each row's wire profile via the HTTP sink
    * (reference's `log`, profile.py:110-142). One POST per profile row,
    * retried with backoff; a permanently failing row fails the job.
    */
  def log(endpoint: String, apiKey: String): Unit =
    ProfileUpload.upload(session.aggProfiles(), endpoint, apiKey, session.name)
}

/** Py4J handle pairing a packed layout frame with its cache release.
  * Materialize the frame FULLY before calling release(): after release a
  * recompute re-samples range boundaries and offsets are no longer
  * guaranteed consistent (see [[graft.ops.Packing]]).
  */
class PyPackedLayout private[python] (df: DataFrame, releaseFn: () => Unit) {
  def toDF(): DataFrame = df
  def release(): Unit = releaseFn()
}

/** Gateway entry points: `spark._jvm.graft.python.PyBridge.…` */
object PyBridge {

  def newProfilingSession(df: DataFrame, name: String): PyProfileSession =
    new PyProfileSession(ProfileSession(df, name))

  def newProfilingSession(df: DataFrame, name: String,
      timeColumn: String): PyProfileSession =
    new PyProfileSession(ProfileSession(df, name).withTimeColumn(timeColumn))

  /** Re-aggregate stored profile rows to a coarser grouping (pass an empty
    * list for a global rollup). Mirrors
    * [[graft.profile.ProfileSession.mergeProfiles]].
    */
  def mergeProfiles(profiles: DataFrame, keys: ju.List[String]): DataFrame =
    ProfileSession.mergeProfiles(profiles, keys.asScala.toSeq)

  /** Entropy-based segment-column selection (whyspark's estimate_segments,
    * autosegmentation.py:77-173) — the Scala engine's one-pass
    * implementation. targetField == null or "" auto-picks the
    * max-entropy column.
    */
  def estimateSegments(df: DataFrame, targetField: String,
      maxSegments: Int): ju.List[String] =
    AutoSegmentation.estimateSegments(
      df, Option(targetField).filter(_.nonEmpty), maxSegments).asJava

  // --- LLM-pipeline ops (python: graftspark.ops) ------------------------
  // Monomorphic mirrors of graft.ops.* — defaults live on the Python side.

  def exactDedup(df: DataFrame, idCol: String,
      keyCols: ju.List[String]): DataFrame =
    graft.ops.Dedup.exact(df, idCol, keyCols.asScala.toSeq)

  def exactDupStats(df: DataFrame, idCol: String,
      keyCols: ju.List[String]): DataFrame =
    graft.ops.Dedup.exactStats(df, idCol, keyCols.asScala.toSeq)

  /** Banded-MinHash near-dup candidate pairs with estimated Jaccard
    * (id_a, id_b, est_jaccard).
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleK: Int,
      maxBucketSize: Int): DataFrame =
    graft.ops.Dedup.minHashLshPairs(
      df, idCol, textCol, numHashes, bands, shingleK, maxBucketSize)

  /** Near-dup cluster labels (id, comp): LSH pairs at >= `threshold`
    * estimated Jaccard, closed transitively by the large-star/small-star
    * connected-components fixpoint.
    */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numHashes: Int, bands: Int, shingleK: Int,
      maxBucketSize: Int, maxIter: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    val pairs = graft.ops.Dedup.minHashLshPairs(
        df, idCol, textCol, numHashes, bands, shingleK, maxBucketSize)
      .filter(col("est_jaccard") >= threshold)
    graft.ops.Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter)
  }

  /** Cross-corpus contamination: (corpus_id, probe_id, jaccard) pairs at
    * >= `threshold` EXACT shingle-Jaccard (LSH proposes, exact decides).
    * Integral ids required on both sides.
    */
  def crossCorpusNearDups(corpus: DataFrame, probe: DataFrame,
      idCol: String, textCol: String, threshold: Double, numHashes: Int,
      bands: Int, shingleK: Int, maxBucketSize: Int): DataFrame =
    graft.ops.Dedup.crossCorpusNearDups(corpus, probe, idCol, textCol,
      threshold, numHashes, bands, shingleK, maxBucketSize)

  /** Hyperplane-LSH embedding near-dup pairs at >= `threshold` cosine. */
  def embeddingNearDups(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, signBits: Int, bands: Int,
      maxBucketSize: Int): DataFrame =
    graft.ops.Dedup.embeddingNearDups(
      df, idCol, embCol, threshold, signBits, bands, maxBucketSize)

  /** Exact cosine top-k of each (broadcast) query against the corpus. */
  def annBruteForce(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, excludeSelf: Boolean): DataFrame =
    graft.ops.Similarity.bruteForceTopK(
      corpus, queries, idCol, embCol, k, excludeSelf)

  /** IVF-pruned approximate top-k (Lloyd-refined codebook, nProbe lists). */
  def annIvf(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nCentroids: Int, nProbe: Int,
      iterations: Int): DataFrame =
    graft.ops.Similarity.ivfTopK(
      corpus, queries, idCol, embCol, k, nCentroids, nProbe, iterations)

  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      topN: Int, minDf: Long): DataFrame =
    graft.ops.TextOps.tfIdfTopTerms(df, idCol, textCol, topN, minDf)

  /** Gap-based sessionization: adds session_seq per user (gap in the
    * timestamp column's native units — microseconds for TIMESTAMP).
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      gap: Long): DataFrame =
    graft.ops.Sessionize.assign(df, userCol, tsCol, gap)

  /** Deterministic id-hash Bernoulli sample (reproducible across runs). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    graft.ops.Sampling.hashSample(df, idCol, fraction)

  /** Deterministic per-group bottom-k sample by id hash. */
  def bottomKSample(df: DataFrame, keyCols: ju.List[String], idCol: String,
      k: Int): DataFrame =
    graft.ops.Sampling.bottomK(df, keyCols.asScala.toSeq, idCol, k)

  /** Per-group IQR outlier bounds + counts from the engine's KLL sketch. */
  def iqrOutliers(df: DataFrame, valueCol: String,
      keyCols: ju.List[String], factor: Double): DataFrame =
    graft.ops.Outliers.iqrStats(df, valueCol, keyCols.asScala.toSeq, factor)

  /** Cap every group at k original rows (deterministic winners). */
  def capPerKey(df: DataFrame, keyCols: ju.List[String], idCol: String,
      k: Int): DataFrame =
    graft.ops.Sampling.capPerKey(df, keyCols.asScala.toSeq, idCol, k)

  /** Deterministic stratified Bernoulli sample: per-stratum keep
    * fractions, same md5-52-bit hash as [[hashSample]].
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: ju.Map[String, java.lang.Double],
      default: Double): DataFrame =
    graft.ops.Sampling.stratifiedSample(df, idCol, stratumCol,
      fractions.asScala.map { case (k, v) => k -> v.doubleValue }.toMap,
      default)

  /** Exact shared-n-gram contamination (GPT-3-style decontamination). */
  def ngramContamination(train: DataFrame, probe: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Int,
      broadcastProbe: Boolean, hashGrams: Boolean): DataFrame =
    graft.ops.Dedup.ngramContamination(train, probe, idCol, textCol, n,
      minShared, broadcastProbe, hashGrams)

  /** CCNet-style corpus-frequent (boilerplate) lines. */
  def frequentLines(df: DataFrame, textCol: String,
      minDocFreq: Long): DataFrame =
    graft.ops.Dedup.frequentLines(df, textCol, minDocFreq)

  /** Rewrite every doc without its corpus-frequent lines. */
  def removeFrequentLines(df: DataFrame, idCol: String, textCol: String,
      minDocFreq: Long): DataFrame =
    graft.ops.Dedup.removeFrequentLines(df, idCol, textCol, minDocFreq)

  /** Deterministic train/val/test split by id-hash range. */
  def hashSplit(df: DataFrame, idCol: String,
      weights: ju.Map[String, java.lang.Double]): DataFrame =
    graft.ops.Sampling.hashSplit(df, idCol,
      weights.asScala.map { case (k, v) => k -> v.doubleValue }.toMap)

  /** Per-document most frequent n-gram + its share of all windows. */
  def topNgramStats(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    graft.ops.TextOps.topNgramStats(df, idCol, textCol, n)

  /** LM sequence packing: concat-and-chunk layout coordinates. NOTE:
    * pins the internal layout frame (MEMORY_AND_DISK) for the session —
    * long-lived sessions doing repeated packs should use
    * [[packSequencesReleasable]] and call release() after materializing.
    */
  def packSequences(df: DataFrame, idCol: String, tokCol: String,
      orderCol: String, budget: Long): DataFrame =
    graft.ops.Packing.packSequences(df, idCol, tokCol, orderCol, budget)

  /** [[packSequences]] with an explicit cache-release handle. */
  def packSequencesReleasable(df: DataFrame, idCol: String, tokCol: String,
      orderCol: String, budget: Long): PyPackedLayout = {
    val (out, release) = graft.ops.Packing.packSequencesReleasable(
      df, idCol, tokCol, orderCol, budget)
    new PyPackedLayout(out, release)
  }

  /** Per-document unigram-LM perplexity (corpus-trained). */
  def unigramPerplexity(df: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame =
    graft.ops.TextOps.unigramPerplexity(df, idCol, textCol, minCount)

  /** Interpolated bigram-LM perplexity (Jelinek–Mercer, corpus-trained). */
  def bigramPerplexity(df: DataFrame, idCol: String, textCol: String,
      lambda: Double, minCount: Long): DataFrame =
    graft.ops.TextOps.bigramPerplexity(df, idCol, textCol, lambda, minCount)

  /** Tag-level markup strip + tag count over a text column. */
  def stripMarkup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(col(idCol),
      graft.ops.TextOps.markupTagCount(col(textCol)).as("n_tags"),
      graft.ops.TextOps.stripMarkup(col(textCol)).as(textCol))
  }

  /** URL-level exact dedup over canonical forms. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    graft.ops.TextOps.urlDedup(df, idCol, urlCol)

  /** Stupid-backoff trigram-LM perplexity (pruned at minCount). */
  def trigramPerplexity(df: DataFrame, idCol: String, textCol: String,
      alpha: Double, minCount: Long): DataFrame =
    graft.ops.TextOps.trigramPerplexity(df, idCol, textCol, alpha, minCount)

  /** Pre-shuffle key-skew report: top-k heavy keys + corpus share. */
  def keySkew(df: DataFrame, keyCols: ju.List[String], topK: Int): DataFrame =
    graft.ops.Diagnostics.keySkew(df, keyCols.asScala.toSeq, topK)

  /** Quality-aware exact dedup: keep the highest-(score, id) row per key. */
  def exactBest(df: DataFrame, keyCols: ju.List[String], scoreCol: String,
      idCol: String): DataFrame =
    graft.ops.Dedup.exactBest(df, keyCols.asScala.toSeq, scoreCol, idCol)

  /** Run-length line dedup of one column (degenerate-text cleanup). */
  def collapseRepeatedLinesColumn(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol, graft.ops.TextOps.collapseRepeatedLines(
      org.apache.spark.sql.functions.col(textCol)))

  /** Deterministic weighted Bernoulli sample (keep prob = weight col). */
  def weightedSample(df: DataFrame, idCol: String,
      weightCol: String): DataFrame =
    graft.ops.Sampling.weightedSample(df, idCol, weightCol)

  /** Temperature-weighted source rebalancing (map-only filter). */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
      targetFraction: Double, temperature: Double): DataFrame =
    graft.ops.Sampling.temperatureMix(df, idCol, sourceCol,
      targetFraction, temperature)

  /** Deterministic token-budget prefix selection. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, tokCol: String,
      budget: Long): DataFrame =
    graft.ops.Sampling.tokenBudgetSelect(df, idCol, tokCol, budget)

  /** SemDeDup survivors: semantic near-dup removal over embeddings. */
  def semDedupSurvivors(df: DataFrame, idCol: String, embCol: String,
      threshold: Double, nCentroids: Int): DataFrame =
    graft.ops.Dedup.semDedupSurvivors(df, idCol, embCol, threshold,
      nCentroids)

  /** Repeated token-window spans across the corpus (exact-substring
    * dedup detection).
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, minDocs: Long): DataFrame =
    graft.ops.Dedup.duplicatedSpans(df, idCol, textCol, windowTokens,
      minDocs)

  /** Exact-substring removal: corpus-frequent token windows excised
    * from every document (merged runs, row-local rebuild).
    */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, minDocs: Long): DataFrame =
    graft.ops.Dedup.removeDuplicatedSpans(df, idCol, textCol,
      windowTokens, minDocs)

  /** Bloom-accelerated exact semi-join (corpus rows whose key appears
    * in the probe set).
    */
  def bloomSemiJoin(corpus: DataFrame, probe: DataFrame, keyCol: String,
      numBits: Long, numHashFns: Int): DataFrame =
    graft.ops.Dedup.bloomSemiJoin(corpus, probe, keyCol, numBits,
      numHashFns)

  /** Clean complement of [[bloomSemiJoin]] — the decontaminated corpus. */
  def bloomAntiJoin(corpus: DataFrame, probe: DataFrame, keyCol: String,
      numBits: Long, numHashFns: Int): DataFrame =
    graft.ops.Dedup.bloomAntiJoin(corpus, probe, keyCol, numBits,
      numHashFns)

  /** Okapi BM25 top-k retrieval of corpus docs for a small query set. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double, b: Double): DataFrame =
    graft.ops.TextOps.bm25TopK(docs, idCol, textCol, queries, qidCol,
      qtextCol, k, k1, b)

  /** Canonical ingest text cleanup of one column (NFC + control strip +
    * whitespace collapse + trim), other columns passed through.
    */
  def normalizeTextColumn(df: DataFrame, textCol: String): DataFrame =
    df.withColumn(textCol,
      graft.ops.TextOps.normalizeText(org.apache.spark.sql.functions
        .col(textCol)))

  /** IVF-PQ ANN: coarse-cell pruning, product-quantized candidate
    * scoring (ADC against broadcast codebooks), bounded exact re-rank.
    */
  def annIvfPq(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nCentroids: Int, nProbe: Int,
      m: Int, ksub: Int, rerank: Int, residual: Boolean): DataFrame =
    graft.ops.Similarity.ivfPqTopK(corpus, queries, idCol, embCol, k,
      nCentroids, nProbe, m, ksub, rerank, residual = residual)

  /** Per-group z-score standardization (broadcast stats, map-only apply). */
  def zscore(df: DataFrame, cols: ju.List[String],
      keys: ju.List[String]): DataFrame =
    graft.ops.FeatureScale.zscore(df, cols.asScala.toSeq, keys.asScala.toSeq)

  /** Per-group min-max scaling to [0, 1]. */
  def minMaxScale(df: DataFrame, cols: ju.List[String],
      keys: ju.List[String]): DataFrame =
    graft.ops.FeatureScale.minMax(df, cols.asScala.toSeq, keys.asScala.toSeq)

  /** Clip a column at its per-group KLL [loQ, hiQ] quantile fences. */
  def winsorize(df: DataFrame, valueCol: String, loQ: Double, hiQ: Double,
      keys: ju.List[String]): DataFrame =
    graft.ops.FeatureScale.winsorize(df, valueCol, loQ, hiQ,
      keys.asScala.toSeq)

  /** Weighted sampling without replacement, k per group (A-ES,
    * deterministic draws).
    */
  def weightedBottomK(df: DataFrame, keyCols: ju.List[String],
      idCol: String, weightCol: String, k: Int): DataFrame =
    graft.ops.Sampling.weightedBottomK(df, keyCols.asScala.toSeq,
      idCol, weightCol, k)

  /** Median/IQR scaling from one KLL aggregate (per group). */
  def robustScale(df: DataFrame, valueCol: String,
      keys: ju.List[String]): DataFrame =
    graft.ops.FeatureScale.robustScale(df, valueCol, keys.asScala.toSeq)

  /** Anomaly screen over a profile time series: per-window metric means
    * z-scored against all windows.
    */
  def metricAnomalies(profiles: DataFrame, cols: ju.List[String],
      keep: ju.List[String], threshold: Double): DataFrame =
    graft.ops.Drift.metricAnomalies(profiles, cols.asScala.toSeq,
      keep.asScala.toSeq, threshold)

  /** PSI/KL bin edges derived from a reference profile sketch's
    * quantiles (one-row reference frame).
    */
  def driftAutoEdges(reference: DataFrame, sketchCol: String,
      probs: ju.List[java.lang.Double]): ju.List[java.lang.Double] =
    graft.ops.Drift.autoEdges(reference, sketchCol,
      probs.asScala.toSeq.map(_.doubleValue))
      .map(java.lang.Double.valueOf).asJava

  /** Profile-driven expectation report. Each check is a list:
    * ["min_at_least", col, bound] / ["max_at_most", col, bound] /
    * ["mean_between", col, lo, hi] / ["null_fraction_at_most", col, f] /
    * ["distinct_between", col, lo, hi] / ["quantile_at_most", col, q, b]
    * / ["type_is", col, expected].
    */
  def validationReport(profiles: DataFrame,
      checks: ju.List[ju.List[AnyRef]],
      keep: ju.List[String]): DataFrame = {
    import graft.ops.Validation
    def d(x: AnyRef): Double = x.asInstanceOf[Number].doubleValue
    val parsed: Seq[Validation.Check] = checks.asScala.toSeq.map { row =>
      val f = row.asScala.toSeq
      val name = f(0).asInstanceOf[String]
      val c = f(1).asInstanceOf[String]
      name match {
        case "min_at_least" => Validation.MinAtLeast(c, d(f(2)))
        case "max_at_most" => Validation.MaxAtMost(c, d(f(2)))
        case "mean_between" => Validation.MeanBetween(c, d(f(2)), d(f(3)))
        case "null_fraction_at_most" =>
          Validation.NullFractionAtMost(c, d(f(2)))
        case "distinct_between" =>
          Validation.DistinctBetween(c, d(f(2)), d(f(3)))
        case "quantile_at_most" =>
          Validation.QuantileAtMost(c, d(f(2)), d(f(3)))
        case "type_is" => Validation.TypeIs(c, f(2).asInstanceOf[String])
        case "stddev_between" =>
          Validation.StddevBetween(c, d(f(2)), d(f(3)))
        case "unique_ratio_between" =>
          Validation.UniqueRatioBetween(c, d(f(2)), d(f(3)))
        case "true_fraction_at_least" =>
          Validation.TrueFractionAtLeast(c, d(f(2)))
        case other =>
          throw new IllegalArgumentException(s"unknown check: $other")
      }
    }
    Validation.report(profiles, parsed, keep.asScala.toSeq)
  }

  /** Gopher document-quality battery (values + verdict per doc). */
  def gopherReport(df: DataFrame, idCol: String, textCol: String,
      minWords: Long, maxWords: Long): DataFrame =
    graft.ops.TextOps.gopherReport(df, idCol, textCol, minWords, maxWords)

  /** C4 line/page cleaning (total report; filter kept = 1). */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int, minLines: Int): DataFrame =
    graft.ops.TextOps.c4Clean(df, idCol, textCol, minLineWords, minLines)

  /** Sliding context-window chunking (window/stride in tokens). */
  def contextChunks(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, strideTokens: Int): DataFrame =
    graft.ops.TextOps.contextChunks(df, idCol, textCol, windowTokens,
      strideTokens)

  /** Register the graft SQL function surface on a session (for python
    * sessions built without the SparkSessionExtensions config).
    */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.functions.registerAll(spark)

  /** In-place PII redaction of a text column (email/URL/phone). */
  def redactPii(df: DataFrame, textCol: String, emailToken: String,
      urlToken: String, phoneToken: String): DataFrame =
    df.withColumn(textCol, graft.ops.TextOps.redactPii(
      df.col(textCol), emailToken, urlToken, phoneToken))

  /** Train the hashed logistic-regression quality classifier on one
    * frame and score another with the learned weights.
    */
  def trainAndScoreQuality(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String, labelCol: String,
      nBuckets: Int, epochs: Int, lr: Double): DataFrame = {
    val w = graft.ops.TextOps.trainHashedLogReg(train, textCol, labelCol,
      nBuckets, epochs, lr)
    val bc = train.sparkSession.sparkContext.broadcast(w)
    graft.ops.TextOps.linearQualityScore(score, idCol, textCol, nBuckets,
      Some(bc))
  }

  /** DSIR hashed-unigram importance weights of raw docs vs a target. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nBuckets: Int): DataFrame =
    graft.ops.TextOps.dsirWeights(raw, target, idCol, textCol, nBuckets)

  /** Per-document n-gram novelty vs a reference corpus. */
  def ngramNovelty(docs: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    graft.ops.TextOps.ngramNovelty(docs, reference, idCol, textCol, n)

  /** Deterministic JL random projection of an embedding column in place. */
  def randomProject(df: DataFrame, embCol: String, dOut: Int,
      seed: Long): DataFrame =
    df.withColumn(embCol,
      graft.ops.Similarity.randomProject(df.col(embCol), dOut, seed))

  /** Matryoshka truncation of an embedding column in place. */
  def matryoshka(df: DataFrame, embCol: String, d: Int): DataFrame =
    df.withColumn(embCol,
      graft.ops.Similarity.truncateNormalize(df.col(embCol), d))

  /** Windowed RMS energy of a PCM16 WAV blob column. */
  def wavWindowRms(df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int): DataFrame =
    graft.ops.Media.wavWindowRms(df, idCol, blobCol, windowFrames)

  /** Decode + nearest-neighbor resize + re-encode a PPM blob column. */
  def resizePpmImages(df: DataFrame, idCol: String, blobCol: String,
      newW: Int, newH: Int): DataFrame =
    graft.ops.Media.resizePpmImages(df, idCol, blobCol, newW, newH)

  /** Schema-drift report between two single-row dataset profiles. */
  def schemaDrift(a: DataFrame, b: DataFrame): DataFrame =
    graft.ops.Drift.schemaDrift(a, b)

  /** Categorical JSD between two frequent-items sketch columns. */
  def categoricalJsd(df: DataFrame, aCol: String, bCol: String,
      eps: Double): DataFrame =
    df.withColumn("jsd", graft.ops.Drift.categoricalJsd(
      df.col(aCol), df.col(bCol), eps = eps))

  /** Categorical total-variation distance between two items sketches. */
  def categoricalTvd(df: DataFrame, aCol: String, bCol: String,
      eps: Double): DataFrame =
    df.withColumn("tvd", graft.ops.Drift.categoricalTvd(
      df.col(aCol), df.col(bCol), eps = eps))

  /** Categorical PSI between two frequent-items sketch columns, appended
    * as `psi` (plus per-side totals `n_a` / `n_b`).
    */
  def categoricalPsi(df: DataFrame, aCol: String, bCol: String,
      eps: Double): DataFrame =
    df.withColumn("n_a", graft.ops.Drift.categoricalTotal(df.col(aCol)))
      .withColumn("n_b", graft.ops.Drift.categoricalTotal(df.col(bCol)))
      .withColumn("psi", graft.ops.Drift.categoricalPsi(
        df.col(aCol), df.col(bCol), eps = eps))

  /** Kolmogorov–Smirnov statistic between two KLL sketch columns over a
    * fixed edge grid, appended as `ks`.
    */
  def ksStatistic(df: DataFrame, aCol: String, bCol: String,
      edges: java.util.List[java.lang.Double]): DataFrame = {
    import scala.jdk.CollectionConverters._
    df.withColumn("ks", graft.ops.Drift.ks(
      df.col(aCol), df.col(bCol), edges.asScala.toSeq.map(_.doubleValue())))
  }

  /** Earth-mover's (Wasserstein-1) distance between two KLL columns. */
  def emdDistance(df: DataFrame, aCol: String, bCol: String,
      edges: java.util.List[java.lang.Double]): DataFrame = {
    import scala.jdk.CollectionConverters._
    df.withColumn("emd", graft.ops.Drift.emd(
      df.col(aCol), df.col(bCol), edges.asScala.toSeq.map(_.doubleValue())))
  }

  /** Train the one-vs-rest hashed language-ID models on a labeled frame
    * and score another frame with them (pred_lang + per-language logits).
    */
  def trainAndScoreLangId(train: DataFrame, score: DataFrame,
      idCol: String, textCol: String, langCol: String,
      langs: java.util.List[String], nBuckets: Int, epochs: Int,
      lr: Double): DataFrame = {
    import scala.jdk.CollectionConverters._
    val models = graft.ops.TextOps.trainLangIdOneVsRest(train, textCol,
      langCol, langs.asScala.toSeq, nBuckets, epochs, lr)
    graft.ops.TextOps.langIdTrained(score, idCol, textCol, models, nBuckets)
  }

  /** aHash64 + dHash64 perceptual hashes of an image blob column
    * (PPM/PNG/JPEG, sniffed per row).
    */
  def imageHashes(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    graft.ops.Media.imageHashes(df, idCol, blobCol)

  /** REAL image decode (PPM byte parser; PNG/JPEG via the JDK's
    * ImageIO) to dims + channel means — sniffed per row.
    */
  def decodeImages(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    graft.ops.Media.decodeImages(df, idCol, blobCol)

  /** REAL audio parse (WAV byte walker; AIFF/AU via the JDK's
    * AudioSystem) to stats — sniffed per row.
    */
  def audioStats(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    graft.ops.Media.audioStats(df, idCol, blobCol)

  /** Leakage-safe split: near-dup components share one split label. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      weights: java.util.Map[String, Double], idColA: String,
      idColB: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.ops.Sampling.leakageSafeSplit(df, idCol, pairs,
      weights.asScala.toMap, idColA, idColB)
  }

  /** Per-source embedding cohesion/confusion report. */
  def sourceSeparation(df: DataFrame, keyCol: String,
      embCol: String): DataFrame =
    graft.ops.Similarity.sourceSeparation(df, keyCol, embCol)

  /** Image quality screen: luminance/contrast/entropy verdicts. */
  def imageQualityStats(df: DataFrame, idCol: String,
      blobCol: String): DataFrame =
    graft.ops.Media.imageQualityStats(df, idCol, blobCol)

  /** Audio quality screen: clipping/silence/ZCR verdicts. */
  def audioQualityStats(df: DataFrame, idCol: String,
      blobCol: String): DataFrame =
    graft.ops.Media.audioQualityStats(df, idCol, blobCol)

  /** Sniffing resize + same-container re-encode. */
  def resizeImages(df: DataFrame, idCol: String, blobCol: String,
      newW: Int, newH: Int): DataFrame =
    graft.ops.Media.resizeImages(df, idCol, blobCol, newW, newH)

  /** Static/low-diversity video screen. */
  def videoFrameDiversity(df: DataFrame, idCol: String,
      blobCol: String, everyN: Int): DataFrame =
    graft.ops.Media.videoFrameDiversity(df, idCol, blobCol, everyN)

  /** Crawl-ingest decode: corrupt blobs drop row-wise. */
  def decodeImagesLenient(df: DataFrame, idCol: String,
      blobCol: String): DataFrame =
    graft.ops.Media.decodeImagesLenient(df, idCol, blobCol)

  /** Crawl-ingest hashing: corrupt blobs drop row-wise. */
  def imageHashesLenient(df: DataFrame, idCol: String,
      blobCol: String): DataFrame =
    graft.ops.Media.imageHashesLenient(df, idCol, blobCol)

  /** SimHash near-dup pair join (multi-index hashing, exact recall
    * for maxHamming <= 15; >= 16 routes to the EAGER measured bounded
    * scan refusing past bruteThreshold).
    */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, maxBucketSize: Int,
      bruteThreshold: Long): DataFrame =
    graft.ops.Dedup.simHashNearDups(df, idCol, textCol, maxHamming,
      maxBucketSize, bruteThreshold)

  /** Near-duplicate image pairs by perceptual-hash Hamming distance
    * (multi-index hashing, exact recall for maxHamming <= 15; >= 16
    * routes to the EAGER measured bounded scan refusing past
    * bruteThreshold).
    */
  def imageHashNearDups(df: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int, useDHash: Boolean, maxBucketSize: Int,
      bruteThreshold: Long): DataFrame =
    graft.ops.Media.imageHashNearDups(df, idCol, blobCol, maxHamming,
      useDHash, maxBucketSize, bruteThreshold)

  /** DCT perceptual hashes (pHash64) of a PPM image blob column. */
  def imagePHashes(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    graft.ops.Media.imagePHashes(df, idCol, blobCol)

  /** Near-duplicate image pairs by pHash Hamming distance (same
    * multi-index-hashing routing as [[imageHashNearDups]]).
    */
  def pHashNearDups(df: DataFrame, idCol: String, blobCol: String,
      maxHamming: Int, maxBucketSize: Int,
      bruteThreshold: Long): DataFrame =
    graft.ops.Media.pHashNearDups(df, idCol, blobCol, maxHamming,
      maxBucketSize, bruteThreshold)

  /** Video near-duplicate pairs by shared sampled-frame hashes. */
  def videoNearDups(df: DataFrame, idCol: String, blobCol: String,
      everyN: Int, minSharedFrames: Int, maxBucketSize: Int): DataFrame =
    graft.ops.Media.videoNearDups(df, idCol, blobCol, everyN,
      minSharedFrames, maxBucketSize)

  /** One-row dedup yield report over a corpus + near-dup pair frame. */
  def dedupYield(corpus: DataFrame, idCol: String, pairs: DataFrame,
      idColA: String, idColB: String): DataFrame =
    graft.ops.Dedup.dedupYield(corpus, idCol, pairs, idColA, idColB)

  /** Deflate-compressibility quality screen. */
  def compressionRatio(df: DataFrame, idCol: String, textCol: String,
      level: Int): DataFrame =
    graft.ops.TextOps.compressionRatio(df, idCol, textCol, level)

  /** Gzip a text column to (id, blob). */
  def gzipTexts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.ops.TextOps.gzipTexts(df, idCol, textCol)

  /** Decompress gzip members to text — strict. */
  def gunzipTexts(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    graft.ops.TextOps.gunzipTexts(df, idCol, blobCol)

  /** [[gunzipTexts]] with crawl-ingest DROP semantics. */
  def gunzipTextsLenient(df: DataFrame, idCol: String,
      blobCol: String): DataFrame =
    graft.ops.TextOps.gunzipTextsLenient(df, idCol, blobCol)

  /** Header-only audio metadata (no sample decode). */
  def audioMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    graft.ops.Media.audioMeta(df, idCol, blobCol)

  /** [[audioMeta]] with crawl-ingest DROP semantics for corrupt headers. */
  def audioMetaLenient(df: DataFrame, idCol: String,
      blobCol: String): DataFrame =
    graft.ops.Media.audioMetaLenient(df, idCol, blobCol)

  /** Header-only image metadata (no pixel decode). */
  def imageMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    graft.ops.Media.imageMeta(df, idCol, blobCol)

  /** [[imageMeta]] with crawl-ingest DROP semantics for corrupt headers. */
  def imageMetaLenient(df: DataFrame, idCol: String,
      blobCol: String): DataFrame =
    graft.ops.Media.imageMetaLenient(df, idCol, blobCol)

  /** Radius-tolerant video near-dup pairs (multi-index-hashing frame
    * join — re-encoded copies whose frame hashes drift a few bits).
    */
  def videoNearDupsFuzzy(df: DataFrame, idCol: String, blobCol: String,
      everyN: Int, maxHamming: Int, minSharedFrames: Int,
      maxBucketSize: Int): DataFrame =
    graft.ops.Media.videoNearDupsFuzzy(df, idCol, blobCol, everyN,
      maxHamming, minSharedFrames, maxBucketSize)

  /** Time-shift-tolerant audio near-dup pairs (sliding fingerprints +
    * offset voting).
    */
  def audioNearDupsShifted(df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int, minSharedBlocks: Int,
      maxBucketSize: Int): DataFrame =
    graft.ops.Media.audioNearDupsShifted(df, idCol, blobCol,
      windowFrames, minSharedBlocks, maxBucketSize)

  /** Windowed image-quality monitor (works on batch AND streaming
    * frames; corrupt blobs cost their row, counted as n_corrupt).
    */
  def imageQualityMonitor(df: DataFrame, tsCol: String, cadence: String,
      watermark: String, idCol: String, blobCol: String): DataFrame =
    graft.streaming.StreamingMedia.imageQualityMonitor(df, tsCol,
      cadence, watermark, idCol, blobCol)

  /** Windowed audio-quality monitor (works on batch AND streaming
    * frames; corrupt blobs cost their row, counted as n_corrupt).
    */
  def audioQualityMonitor(df: DataFrame, tsCol: String, cadence: String,
      watermark: String, idCol: String, blobCol: String): DataFrame =
    graft.streaming.StreamingMedia.audioQualityMonitor(df, tsCol,
      cadence, watermark, idCol, blobCol)

  /** Windowed RMS / per-channel zero-crossing / peak stats of a PCM16
    * WAV blob column.
    */
  def wavWindowStats(df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int): DataFrame =
    graft.ops.Media.wavWindowStats(df, idCol, blobCol, windowFrames)

  /** Persist a reference corpus's distinct gram hashes as a bucketed
    * store table for [[ngramNoveltyStored]].
    */
  def writeNoveltyReference(reference: DataFrame, textCol: String,
      n: Int, table: String, numBuckets: Int): Unit =
    graft.ops.TextOps.writeNoveltyReference(reference, textCol, n, table,
      numBuckets)

  /** Per-document n-gram novelty against a stored
    * [[writeNoveltyReference]] table (reference side never re-shuffles).
    */
  def ngramNoveltyStored(docs: DataFrame, table: String, idCol: String,
      textCol: String, n: Int): DataFrame =
    graft.ops.TextOps.ngramNoveltyStored(docs, table, idCol, textCol, n)

  /** Row-local novelty scoring against a broadcast reference gram set —
    * the streaming-safe form (works on batch AND streaming frames; the
    * reference is collected once at call time).
    */
  def noveltyScoreBroadcast(docs: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val ref = graft.streaming.StreamingNovelty.referenceGrams(
      reference, textCol, n)
    graft.streaming.StreamingNovelty.score(docs, ref, idCol, textCol, n)
  }

  /** [[noveltyScoreBroadcast]] with the reference collapsed to
    * fixed-size Bloom filter bytes — bounded driver state for large
    * references; novelty is a lower bound by the filter's FP rate.
    */
  def noveltyScoreBloom(docs: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, n: Int, numBits: Long,
      numHashFns: Int): DataFrame = {
    val ref = graft.streaming.StreamingNovelty.referenceGramsBloom(
      reference, textCol, n, numBits, numHashFns)
    graft.streaming.StreamingNovelty.scoreBloom(docs, ref, idCol,
      textCol, n)
  }

  /** Per-clip audio sub-fingerprints (band-energy-delta sign blocks). */
  def audioFingerprints(df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int): DataFrame =
    graft.ops.Media.audioFingerprints(df, idCol, blobCol, windowFrames)

  /** Audio near-duplicate pairs by shared sub-fingerprint blocks. */
  def audioNearDups(df: DataFrame, idCol: String, blobCol: String,
      windowFrames: Int, minSharedBlocks: Int,
      maxBucketSize: Int): DataFrame =
    graft.ops.Media.audioNearDups(df, idCol, blobCol, windowFrames,
      minSharedBlocks, maxBucketSize)

  /** Encoding-hygiene profile (mojibake / corruption screen) per row:
    * id + the [[graft.ops.TextOps.encodingProfile]] fields flattened.
    */
  def encodingProfile(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(col(idCol),
        graft.ops.TextOps.encodingProfile(col(textCol)).as("p"))
      .select(col(idCol), col("p.*"))
  }

  /** DoReMi-lite domain mixture weights from per-example proxy and
    * reference loss columns.
    */
  def doremiWeights(df: DataFrame, domainCol: String,
      proxyLossCol: String, refLossCol: String, eta: Double, steps: Int,
      smoothing: Double): DataFrame =
    graft.ops.Sampling.doremiWeights(df, domainCol, proxyLossCol,
      refLossCol, eta, steps, smoothing)

  /** Deterministic per-domain resampling toward a target mixture
    * (weights frame: domain, weight — e.g. [[doremiWeights]] output).
    */
  def applyMixtureWeights(df: DataFrame, domainCol: String, idCol: String,
      weights: DataFrame, targetFraction: Double, weightDomainCol: String,
      weightCol: String): DataFrame =
    graft.ops.Sampling.applyMixtureWeights(df, domainCol, idCol, weights,
      targetFraction, weightDomainCol, weightCol)

  /** Ordered per-user funnel depth + first step-completion times. */
  def funnelDepth(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: java.util.List[String],
      tieCols: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.ops.Funnel.depth(df, userCol, tsCol, typeCol,
      steps.asScala.toSeq, tieCols.asScala.toSeq)
  }

  /** Cohort retention triangle (first-day cohorts, per-offset distinct
    * active users).
    */
  def retentionCohorts(df: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    graft.ops.Retention.cohorts(df, userCol, tsCol)

  /** Write the deterministic hash-sharded training layout. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int,
      path: String): Unit =
    graft.io.ShardWriter.writeShards(df, idCol, nShards, path)

  /** Event-flow transition matrix (terminal rows have NULL to_type). */
  def eventTransitions(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCols: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.ops.Funnel.transitions(df, userCol, tsCol, typeCol,
      tieCols.asScala.toSeq)
  }

  /** Exact per-(group, value) empirical-CDF table (cume_dist
    * semantics, distributed prefix sum — no global window).
    */
  def percentileRanks(df: DataFrame, valueCol: String,
      keys: java.util.List[String], outCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.ops.FeatureScale.percentileRanks(df, valueCol,
      keys.asScala.toSeq, outCol)
  }

  /** Attach the exact percentile rank of `valueCol` to every row. */
  def percentileRank(df: DataFrame, valueCol: String,
      keys: java.util.List[String], outCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.ops.FeatureScale.percentileRank(df, valueCol,
      keys.asScala.toSeq, outCol)
  }

  /** One-row embedding-distribution drift summary between two frames. */
  def embeddingDrift(current: DataFrame, reference: DataFrame,
      embCol: String): DataFrame =
    graft.ops.Drift.embeddingDrift(current, reference, embCol)

  /** Per-dimension embedding mean shift (drill-down of
    * [[embeddingDrift]]).
    */
  def embeddingDriftByDim(current: DataFrame, reference: DataFrame,
      embCol: String): DataFrame =
    graft.ops.Drift.embeddingDriftByDim(current, reference, embCol)

  /** Attach the Morton z-order key over `cols` (`zkey`). */
  def withZKey(df: DataFrame, cols: java.util.List[String],
      bits: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.io.ZOrderLayout.withZKey(df, cols.asScala.toSeq, bits)
  }

  /** Write the z-ordered multi-column-clustered parquet layout. */
  def writeZOrdered(df: DataFrame, cols: java.util.List[String],
      path: String, bits: Int, numFiles: Int): Unit = {
    import scala.jdk.CollectionConverters._
    graft.io.ZOrderLayout.writeZOrdered(df, cols.asScala.toSeq, path,
      bits, numFiles)
  }

  /** Write the file-stats manifest for a parquet layout. */
  def writeManifest(spark: org.apache.spark.sql.SparkSession,
      layoutPath: String, cols: java.util.List[String],
      manifestPath: String): Unit = {
    import scala.jdk.CollectionConverters._
    graft.io.LayoutManifest.writeManifest(spark, layoutPath,
      cols.asScala.toSeq, manifestPath)
  }

  /** Manifest-pruned range read over a written layout. */
  def prunedRead(spark: org.apache.spark.sql.SparkSession,
      layoutPath: String, manifestPath: String, valueCol: String,
      lo: Double, hi: Double): DataFrame =
    graft.io.LayoutManifest.prunedRead(spark, layoutPath, manifestPath,
      valueCol, lo, hi)

  /** Write a per-file bloom manifest on a high-cardinality column. */
  def writeBloomManifest(spark: org.apache.spark.sql.SparkSession,
      layoutPath: String, colName: String, manifestPath: String,
      numBits: Long, numHashFns: Int): Unit =
    graft.io.LayoutManifest.writeBloomManifest(spark, layoutPath,
      colName, manifestPath, numBits, numHashFns)

  /** Bloom-pruned equality read (long-keyed columns). */
  def lookupRead(spark: org.apache.spark.sql.SparkSession,
      layoutPath: String, manifestPath: String, colName: String,
      value: Long): DataFrame =
    graft.io.LayoutManifest.lookupRead(spark, layoutPath, manifestPath,
      colName, value)

  /** Bloom-pruned equality read (string-keyed columns). */
  def lookupReadString(spark: org.apache.spark.sql.SparkSession,
      layoutPath: String, manifestPath: String, colName: String,
      value: String): DataFrame =
    graft.io.LayoutManifest.lookupRead(spark, layoutPath, manifestPath,
      colName, value)

  /** Time-decayed per-key event score (2^(-age/halfLife) weights,
    * anchored at each key's last event).
    */
  def decayedScore(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, halfLifeSeconds: Double): DataFrame =
    graft.ops.EventStats.decayedScore(df, keyCol, tsCol, valueCol,
      halfLifeSeconds)

  /** Time-decayed per-key event count. */
  def decayedCount(df: DataFrame, keyCol: String, tsCol: String,
      halfLifeSeconds: Double): DataFrame =
    graft.ops.EventStats.decayedCount(df, keyCol, tsCol, halfLifeSeconds)

  /** Pairwise Pearson correlation + covariance over numeric columns. */
  def corrMatrix(df: DataFrame, cols: java.util.List[String]): DataFrame =
    graft.ops.Stats.corrMatrix(df, cols.asScala.toSeq)

  /** MI / chi-squared / Cramer's V between two categorical columns. */
  def categoricalAssociation(df: DataFrame, colA: String,
      colB: String): DataFrame =
    graft.ops.Stats.categoricalAssociation(df, colA, colB)

  /** Weighted PageRank by fixed power iteration ("" weightCol = counts). */
  def pageRank(df: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int, damping: Double): DataFrame =
    graft.ops.Graph.pageRank(df, srcCol, dstCol,
      Option(weightCol).filter(_.nonEmpty), iterations, damping)

  /** Exact self-kNN label-noise screen. */
  def knnLabelNoise(df: DataFrame, idCol: String, embCol: String,
      labelCol: String, k: Int): DataFrame =
    graft.ops.Similarity.knnLabelNoise(df, idCol, embCol, labelCol, k)

  /** [[knnLabelNoise]] with explicit routing knobs (brute-force
    * broadcast threshold + IVF parameters above it).
    */
  def knnLabelNoiseRouted(df: DataFrame, idCol: String, embCol: String,
      labelCol: String, k: Int, bruteForceThreshold: Long,
      nCentroids: Int, nProbe: Int): DataFrame =
    graft.ops.Similarity.knnLabelNoise(df, idCol, embCol, labelCol, k,
      bruteForceThreshold, nCentroids, nProbe)

  /** Label-noise scoring over a precomputed neighbor frame. */
  def labelNoiseFromNeighbors(neighbors: DataFrame, labels: DataFrame,
      idCol: String, labelCol: String): DataFrame =
    graft.ops.Similarity.labelNoiseFromNeighbors(neighbors, labels,
      idCol, labelCol)

  /** Pairwise n-gram Jaccard overlap between corpus groups. */
  def sourceOverlap(df: DataFrame, groupCol: String, textCol: String,
      n: Int): DataFrame =
    graft.ops.TextOps.sourceOverlap(df, groupCol, textCol, n)

  /** Exact trailing-window per-event stats (count/sum/mean). */
  def rollingWindowStats(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowSeconds: Long): DataFrame =
    graft.ops.EventStats.rollingWindowStats(df, keyCol, tsCol, valueCol,
      windowSeconds)

  /** Fuzzy (edit-distance) record-linkage join with blocking. */
  def fuzzyJoin(left: DataFrame, right: DataFrame, idCol: String,
      keyCol: String, maxDist: Int, prefixLen: Int,
      symmetricPrefixes: Boolean): DataFrame =
    graft.ops.Joins.fuzzyJoin(left, right, idCol, keyCol, maxDist,
      prefixLen, symmetricPrefixes)

  /** Per-bucket top-k trending items. */
  def trendingItems(df: DataFrame, tsCol: String, itemCol: String,
      bucketSeconds: Long, k: Int): DataFrame =
    graft.ops.EventStats.trendingItems(df, tsCol, itemCol,
      bucketSeconds, k)

  /** First/last-touch conversion attribution inside a lookback. */
  def touchAttribution(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, tieCol: String,
      touchTypes: java.util.List[String], conversionType: String,
      lookbackSeconds: Long): DataFrame =
    graft.ops.EventStats.touchAttribution(df, keyCol, tsCol, typeCol,
      tieCol, touchTypes.asScala.toSeq, conversionType, lookbackSeconds)

  /** Self-vote synchronous label propagation (community detection). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame =
    graft.ops.Graph.labelPropagation(edges, srcCol, dstCol, iterations)

  /** Deterministic cosine k-means clustering. */
  def kmeansClusters(df: DataFrame, idCol: String, embCol: String,
      k: Int, iterations: Int): DataFrame =
    graft.ops.Similarity.kmeansClusters(df, idCol, embCol, k, iterations)

  /** Per-key inter-arrival (burstiness) statistics. */
  def interArrivalStats(df: DataFrame, keyCol: String,
      tsCol: String): DataFrame =
    graft.ops.EventStats.interArrivalStats(df, keyCol, tsCol)

  /** Gini + top-decile concentration of per-key weight ("" = counts). */
  def concentration(df: DataFrame, keyCol: String,
      valueCol: String): DataFrame =
    graft.ops.EventStats.concentration(df, keyCol,
      Option(valueCol).filter(_.nonEmpty))

  /** Zipf-law OLS fit over top-N token frequencies. */
  def zipfFit(df: DataFrame, textCol: String, topN: Int): DataFrame =
    graft.ops.TextOps.zipfFit(df, textCol, topN)

  /** Per-node in/out/undirected degree statistics. */
  def degreeStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    graft.ops.Graph.degreeStats(edges, srcCol, dstCol)

  /** Global triangle census + clustering coefficient. */
  def triangleStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    graft.ops.Graph.triangleStats(edges, srcCol, dstCol)

  /** CUSUM level-shift screen over per-group metric series. */
  def cusum(df: DataFrame, groupCols: java.util.List[String],
      orderCol: String, valueCol: String, k: Double,
      h: Double): DataFrame =
    graft.ops.Drift.cusum(df, groupCols.asScala.toSeq, orderCol,
      valueCol, k, h)

  /** Snapshot diff between two versions of a keyed corpus. */
  def corpusDiff(older: DataFrame, newer: DataFrame, idCol: String,
      compareCols: java.util.List[String]): DataFrame =
    graft.ops.Diagnostics.corpusDiff(older, newer, idCol,
      compareCols.asScala.toSeq)

  /** Item-pair association (support/confidence/lift) over baskets. */
  def basketCoOccurrence(df: DataFrame, basketCol: String,
      itemCol: String, minCount: Long): DataFrame =
    graft.ops.Baskets.coOccurrence(df, basketCol, itemCol, minCount)

  /** Tie-corrected Mann-Whitney ROC AUC. */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    graft.ops.ModelEval.auc(df, scoreCol, labelCol)

  /** Equal-width reliability table on [0, 1]. */
  def calibrationReport(df: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int): DataFrame =
    graft.ops.ModelEval.calibrationReport(df, scoreCol, labelCol, nBins)

  /** Expected calibration error. */
  def ece(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int): DataFrame =
    graft.ops.ModelEval.ece(df, scoreCol, labelCol, nBins)

  /** One-row Brier score + base rate. */
  def brierScore(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame =
    graft.ops.ModelEval.brierScore(df, scoreCol, labelCol)

  /** Decile lift / cumulative-gains table. */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int): DataFrame =
    graft.ops.ModelEval.liftTable(df, scoreCol, labelCol, nBins)

  /** One-row average precision (PR-curve area). */
  def averagePrecision(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame =
    graft.ops.ModelEval.averagePrecision(df, scoreCol, labelCol)

  /** Operating-point confusion + derived metrics per threshold. */
  def thresholdReport(df: DataFrame, scoreCol: String,
      labelCol: String,
      thresholds: java.util.List[java.lang.Double]): DataFrame =
    graft.ops.ModelEval.thresholdReport(df, scoreCol, labelCol,
      thresholds.asScala.toSeq.map(_.doubleValue()))

  /** Per-query NDCG@k / RR / precision@k / recall@k. */
  def rankingReport(df: DataFrame, queryCol: String, itemCol: String,
      scoreCol: String, relCol: String, k: Int): DataFrame =
    graft.ops.ModelEval.rankingReport(df, queryCol, itemCol, scoreCol,
      relCol, k)

  /** Sample autocorrelation of an evenly-indexed series. */
  def acf(df: DataFrame, indexCol: String, valueCol: String,
      maxLag: Int): DataFrame =
    graft.ops.EventStats.acf(df, indexCol, valueCol, maxLag)

  /** [[acf]] over gap-filled per-bucket event counts. */
  def eventAcf(df: DataFrame, tsCol: String, bucketSeconds: Long,
      maxLag: Int): DataFrame =
    graft.ops.EventStats.eventAcf(df, tsCol, bucketSeconds, maxLag)

  /** Exact discrete quantiles (quantile_disc semantics). */
  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: java.util.List[java.lang.Double],
      keys: java.util.List[String]): DataFrame =
    graft.ops.FeatureScale.exactQuantiles(df, valueCol,
      qs.asScala.toSeq.map(_.doubleValue()), keys.asScala.toSeq)

  /** Welch's unequal-variance two-sample t-test. */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame =
    graft.ops.Stats.welchTTest(df, groupCol, valueCol, groupA, groupB)

  /** Per-segment Welch t-tests from one aggregate. */
  def welchTTestBy(df: DataFrame, keys: java.util.List[String],
      groupCol: String, valueCol: String, groupA: String,
      groupB: String): DataFrame =
    graft.ops.Stats.welchTTestBy(df, keys.asScala.toSeq, groupCol,
      valueCol, groupA, groupB)

  /** Theil-Sen + OLS trend of a bucketed series. */
  def trendSlope(df: DataFrame, indexCol: String,
      valueCol: String): DataFrame =
    graft.ops.EventStats.trendSlope(df, indexCol, valueCol)

  /** Exact categorical distribution shape (entropy/gini/top share). */
  def categoricalProfile(df: DataFrame, colName: String): DataFrame =
    graft.ops.Stats.categoricalProfile(df, colName)

  /** Exact single change-point (two-segment SSE argmin). */
  def changePoint(df: DataFrame, indexCol: String,
      valueCol: String): DataFrame =
    graft.ops.EventStats.changePoint(df, indexCol, valueCol)

  /** Seasonality-aware residual anomaly flags. */
  def seasonalAnomalies(df: DataFrame, indexCol: String,
      valueCol: String, period: Int, trendWindow: Int,
      zThreshold: Double): DataFrame =
    graft.ops.EventStats.seasonalAnomalies(df, indexCol, valueCol,
      period, trendWindow, zThreshold)

  /** Tie-corrected Mann-Whitney U / z between two groups. */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame =
    graft.ops.Stats.mannWhitney(df, groupCol, valueCol, groupA, groupB)

  /** Pooled two-sample proportion z-test. */
  def proportionTest(df: DataFrame, groupCol: String,
      successCol: String, groupA: String, groupB: String): DataFrame =
    graft.ops.Stats.proportionTest(df, groupCol, successCol, groupA,
      groupB)

  /** CUPED covariate adjustment (adds `outCol`). */
  def cuped(df: DataFrame, metricCol: String, covariateCol: String,
      outCol: String): DataFrame =
    graft.ops.Stats.cuped(df, metricCol, covariateCol, outCol)

  /** Sample-ratio-mismatch check vs designed allocations. */
  def srmCheck(df: DataFrame, groupCol: String,
      groups: java.util.List[String],
      weights: java.util.List[java.lang.Double]): DataFrame =
    graft.ops.Stats.srmCheck(df, groupCol,
      groups.asScala.toSeq.zip(
        weights.asScala.toSeq.map(_.doubleValue())))

  /** Simpson's-paradox screen (pooled vs stratified diff). */
  def simpsonCheck(df: DataFrame, treatCol: String, metricCol: String,
      strataCol: String): DataFrame =
    graft.ops.Stats.simpsonCheck(df, treatCol, metricCol, strataCol)

  /** Trimmed mean inside exact quantile cuts. */
  def trimmedMean(df: DataFrame, valueCol: String, loQ: Double,
      hiQ: Double): DataFrame =
    graft.ops.Stats.trimmedMean(df, valueCol, loQ, hiQ)

  /** Delta-method ratio-metric A/B test. */
  def ratioTest(df: DataFrame, groupCol: String, numCol: String,
      denCol: String, groupA: String, groupB: String): DataFrame =
    graft.ops.Stats.ratioTest(df, groupCol, numCol, denCol, groupA,
      groupB)

  /** Per-quantile treatment-effect gaps between two groups. */
  def quantileTreatmentEffects(df: DataFrame, groupCol: String,
      valueCol: String, qs: java.util.List[java.lang.Double],
      groupA: String, groupB: String): DataFrame =
    graft.ops.Stats.quantileTreatmentEffects(df, groupCol, valueCol,
      qs.asScala.toSeq.map(_.doubleValue()), groupA, groupB)

  /** Inter-rater agreement (po / pe / Cohen's kappa). */
  def agreementReport(df: DataFrame, colA: String,
      colB: String): DataFrame =
    graft.ops.Stats.agreementReport(df, colA, colB)

  /** Dense per-bucket event-count series (quiet buckets = 0). */
  def eventSeries(df: DataFrame, tsCol: String,
      bucketSeconds: Long): DataFrame =
    graft.ops.EventStats.eventSeries(df, tsCol, bucketSeconds)

  /** Additive trend / seasonal / residual decomposition. */
  def decompose(df: DataFrame, indexCol: String, valueCol: String,
      period: Int, trendWindow: Int): DataFrame =
    graft.ops.EventStats.decompose(df, indexCol, valueCol, period,
      trendWindow)

  /** Weight-per-row exact quantiles (weight column by name). */
  def weightedQuantiles(df: DataFrame, valueCol: String,
      weightCol: String, qs: java.util.List[java.lang.Double],
      keys: java.util.List[String]): DataFrame =
    graft.ops.FeatureScale.weightedQuantiles(df, valueCol,
      org.apache.spark.sql.functions.col(weightCol),
      qs.asScala.toSeq.map(_.doubleValue()), keys.asScala.toSeq)

  /** Blocked Jaro-Winkler record linkage. */
  def nameMatchPairs(left: DataFrame, right: DataFrame, idCol: String,
      keyCol: String, minSim: Double, prefixLen: Int,
      bandWidth: Int): DataFrame =
    graft.ops.Joins.nameMatchPairs(left, right, idCol, keyCol, minSim,
      prefixLen, bandWidth)

  /** Jaro-Winkler linkage blocked on an external exact column. */
  def nameMatchPairsBlocked(left: DataFrame, right: DataFrame,
      idCol: String, keyCol: String, blockCol: String,
      minSim: Double): DataFrame =
    graft.ops.Joins.nameMatchPairsBlocked(left, right, idCol, keyCol,
      blockCol, minSim)

  /** Exact pre-flight equi-join output-size forecast. */
  def joinSizeEstimate(left: DataFrame, right: DataFrame,
      leftKeyCols: java.util.List[String],
      rightKeyCols: java.util.List[String]): DataFrame =
    graft.ops.Diagnostics.joinSizeEstimate(left, right,
      leftKeyCols.asScala.toSeq, rightKeyCols.asScala.toSeq)

  /** Order-insensitive cross-engine table checksum. */
  def tableChecksum(df: DataFrame,
      cols: java.util.List[String]): DataFrame =
    graft.ops.Diagnostics.tableChecksum(df, cols.asScala.toSeq)

  /** FK-violation counter (orphan child rows vs a parent key set). */
  def referentialIntegrity(child: DataFrame,
      childKeyCols: java.util.List[String], parent: DataFrame,
      parentKeyCols: java.util.List[String]): DataFrame =
    graft.ops.Validation.referentialIntegrity(child,
      childKeyCols.asScala.toSeq, parent, parentKeyCols.asScala.toSeq)

  /** Key-uniqueness report ("is this really a primary key"). */
  def uniquenessReport(df: DataFrame,
      keyCols: java.util.List[String]): DataFrame =
    graft.ops.Validation.uniquenessReport(df, keyCols.asScala.toSeq)

  /** Padding-waste report for length-bucketed batching (Py4J sends
    * small Python ints as Integer, large as Long — accept both).
    */
  def lengthBuckets(df: DataFrame, lenCol: String,
      boundaries: java.util.List[java.lang.Number]): DataFrame =
    graft.ops.Packing.lengthBuckets(df, lenCol,
      boundaries.asScala.toSeq.map(_.longValue))

  /** Deterministic source-interleaved ordering rank. */
  def interleaveSources(df: DataFrame, sourceCol: String,
      idCol: String): DataFrame =
    graft.ops.Sampling.interleaveSources(df, sourceCol, idCol)

  /** C4-style blocklist screen (per-doc flagged ratio + verdict). */
  def blocklistReport(df: DataFrame, idCol: String, textCol: String,
      words: java.util.List[String], maxRatio: Double): DataFrame =
    graft.ops.TextOps.blocklistReport(df, idCol, textCol,
      words.asScala.toSeq, maxRatio)

  /** URL-domain histogram (n_urls, n_docs per lowercased host). */
  def urlDomainStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    graft.ops.TextOps.urlDomainStats(df, idCol, textCol)

  /** Personalized PageRank seeded on a node set ("" weightCol =
    * unweighted).
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      weightCol: String, iterations: Int, damping: Double): DataFrame =
    graft.ops.Graph.personalizedPageRank(edges, srcCol, dstCol, seeds,
      seedCol, Option(weightCol).filter(_.nonEmpty), iterations,
      damping)

  /** HITS hubs and authorities (L1-normalized per round). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame =
    graft.ops.Graph.hits(edges, srcCol, dstCol, iterations)

  /** Readability battery per row (Flesch / FK grade / ARI + counts). */
  def readability(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(col(idCol),
        graft.ops.TextOps.readability(col(textCol)).as("__r"))
      .select(col(idCol), col("__r.*"))
  }

  /** Top-k bigram collocations by PMI. */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Int,
      topK: Int): DataFrame =
    graft.ops.TextOps.pmiCollocations(df, textCol, minCount, topK)

  /** BPE merge training: (step, left, right, cnt), `merges` rows. */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int): DataFrame =
    graft.ops.Tokenizer.bpeTrain(df, textCol, merges)

  /** Persist a bpeTrain merge table as a store table. */
  def writeBpeMerges(merges: DataFrame, table: String): Unit = {
    val ms = merges.orderBy("step").collect().zipWithIndex.map {
      case (r, i) => graft.ops.Tokenizer.Merge(i, r.getString(1),
        r.getString(2), r.getLong(3))
    }.toSeq
    graft.ops.Tokenizer.writeMerges(ms, table, merges.sparkSession)
  }

  /** Encode piece counts against a stored merge table. */
  def bpeEncodeStored(df: DataFrame, idCol: String, textCol: String,
      table: String): DataFrame =
    graft.ops.Tokenizer.encodeWithStored(df, idCol, textCol, table)

  /** Encode piece counts with a learned merge table (a [[bpeTrain]]
    * result — collected here; it is merge-count-sized by construction).
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val ms = merges.orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    df.select(col(idCol),
      graft.ops.Tokenizer.encodePieceCount(col(textCol), ms)
        .as("n_pieces"))
  }

  /** Long-form upper-triangular embedding covariance (i, j, cov). */
  def embedCovMatrix(df: DataFrame, embCol: String): DataFrame =
    graft.ops.Pca.covMatrix(df, embCol)

  /** Fit PCA and project to the top-k components (adds `pca` array). */
  def pcaProject(df: DataFrame, embCol: String, k: Int): DataFrame = {
    val m = graft.ops.Pca.fit(df, embCol)
    graft.ops.Pca.project(df, embCol, m, k)
  }

  /** PCA explained-variance report per component. */
  def pcaExplainedVariance(df: DataFrame, embCol: String): DataFrame = {
    val m = graft.ops.Pca.fit(df, embCol)
    graft.ops.Pca.explainedVariance(df.sparkSession, m)
  }

  /** Pairwise PSI/JSD drift matrix across all groups of a column. */
  def psiMatrix(df: DataFrame, groupCol: String, valueCol: String,
      edges: ju.List[Double]): DataFrame =
    graft.ops.Drift.psiMatrix(df, groupCol, valueCol,
      edges.asScala.map(_.doubleValue).toSeq)

  /** PCA-whitened top-k projection (unit-variance decorrelated scores). */
  def pcaWhiten(df: DataFrame, embCol: String, k: Int): DataFrame = {
    val m = graft.ops.Pca.fit(df, embCol)
    graft.ops.Pca.whiten(df, embCol, m, k)
  }

  /** Persist a corpus's MinHash-LSH index as bucketed store tables. */
  def writeMinHashReference(reference: DataFrame, idCol: String,
      textCol: String, table: String, numHashes: Int, bands: Int,
      shingleK: Int, numBuckets: Int, maxBucketSize: Int): Unit =
    graft.ops.Dedup.writeMinHashReference(reference, idCol, textCol,
      table, numHashes, bands, shingleK, numBuckets, maxBucketSize)

  /** Near-dup pairs of a new batch vs a stored MinHash index. */
  def minHashNearDupsStored(docs: DataFrame, table: String,
      idCol: String, textCol: String, numHashes: Int, bands: Int,
      shingleK: Int, threshold: Double): DataFrame =
    graft.ops.Dedup.minHashNearDupsStored(docs, table, idCol, textCol,
      numHashes, bands, shingleK, threshold)

  /** Persist a corpus's 8-byte SimHash index as a bucketed store
    * table (the cheapest stored text screen by state).
    */
  def writeSimHashReference(reference: DataFrame, idCol: String,
      textCol: String, table: String, numBuckets: Int,
      maxBucketSize: Int): Unit =
    graft.ops.Dedup.writeSimHashReference(reference, idCol, textCol,
      table, numBuckets, maxBucketSize)

  /** GROW a stored SimHash index with a new batch. */
  def appendSimHashReference(docs: DataFrame, idCol: String,
      textCol: String, table: String): Unit =
    graft.ops.Dedup.appendSimHashReference(docs, idCol, textCol, table)

  /** Near-dup (new doc, stored doc) pairs vs a stored SimHash index
    * (exact recall for maxHamming <= 15 via multi-index-hashing probe
    * expansion against the unchanged store).
    */
  def simHashNearDupsStored(docs: DataFrame, table: String,
      idCol: String, textCol: String, maxHamming: Int): DataFrame =
    graft.ops.Dedup.simHashNearDupsStored(docs, table, idCol, textCol,
      maxHamming)

  /** Persist an image perceptual-hash LSH index as a store table. */
  def writeImageHashReference(reference: DataFrame, idCol: String,
      blobCol: String, table: String, useDHash: Boolean,
      numBuckets: Int, maxBucketSize: Int): Unit =
    graft.ops.Media.writeImageHashReference(reference, idCol, blobCol,
      table, useDHash, numBuckets, maxBucketSize)

  /** Near-dup (new image, stored image) pairs vs a stored index. */
  def imageHashNearDupsStored(docs: DataFrame, table: String,
      idCol: String, blobCol: String, maxHamming: Int,
      useDHash: Boolean): DataFrame =
    graft.ops.Media.imageHashNearDupsStored(docs, table, idCol, blobCol,
      maxHamming, useDHash)

  /** Persist a pHash (DCT) LSH index as a store table. */
  def writePHashReference(reference: DataFrame, idCol: String,
      blobCol: String, table: String, numBuckets: Int,
      maxBucketSize: Int): Unit =
    graft.ops.Media.writePHashReference(reference, idCol, blobCol,
      table, numBuckets, maxBucketSize)

  /** Grow a pHash store with a new image batch. */
  def appendPHashReference(docs: DataFrame, idCol: String,
      blobCol: String, table: String): Unit =
    graft.ops.Media.appendPHashReference(docs, idCol, blobCol, table)

  /** Near-dup (new image, stored image) pairs vs a pHash store. */
  def pHashNearDupsStored(docs: DataFrame, table: String,
      idCol: String, blobCol: String, maxHamming: Int): DataFrame =
    graft.ops.Media.pHashNearDupsStored(docs, table, idCol, blobCol,
      maxHamming)

  /** Persist an audio-fingerprint store for incremental audio dedup. */
  def writeAudioFpReference(reference: DataFrame, idCol: String,
      blobCol: String, table: String, windowFrames: Int,
      numBuckets: Int, maxBucketSize: Int): Unit =
    graft.ops.Media.writeAudioFpReference(reference, idCol, blobCol,
      table, windowFrames, numBuckets, maxBucketSize)

  /** Grow an audio-fingerprint store with a new batch. */
  def appendAudioFpReference(docs: DataFrame, table: String,
      idCol: String, blobCol: String, windowFrames: Int): Unit =
    graft.ops.Media.appendAudioFpReference(docs, table, idCol, blobCol,
      windowFrames)

  /** Near-dup (new clip, stored clip) pairs vs a stored index. */
  def audioNearDupsStored(docs: DataFrame, table: String,
      idCol: String, blobCol: String, windowFrames: Int,
      minSharedBlocks: Int, maxBucketSize: Int): DataFrame =
    graft.ops.Media.audioNearDupsStored(docs, table, idCol, blobCol,
      windowFrames, minSharedBlocks, maxBucketSize)

  /** One-row k-anonymity report over quasi-identifier columns. */
  def kAnonymityReport(df: DataFrame, quasiCols: ju.List[String],
      k: Long): DataFrame =
    graft.ops.Privacy.kAnonymityReport(df, quasiCols.asScala.toSeq, k)

  /** The violating quasi-identifier groups, smallest first, bounded. */
  def kAnonymityViolations(df: DataFrame, quasiCols: ju.List[String],
      k: Long, maxGroups: Int): DataFrame =
    graft.ops.Privacy.kAnonymityViolations(df, quasiCols.asScala.toSeq,
      k, maxGroups)

  /** One-row distinct l-diversity report over a sensitive column. */
  def lDiversityReport(df: DataFrame, quasiCols: ju.List[String],
      sensitiveCol: String, l: Long): DataFrame =
    graft.ops.Privacy.lDiversityReport(df, quasiCols.asScala.toSeq,
      sensitiveCol, l)

  /** Feature-relevance ranking: per-feature association vs a label. */
  def featureRelevance(df: DataFrame, featureCols: ju.List[String],
      labelCol: String): DataFrame =
    graft.ops.Stats.featureRelevance(df, featureCols.asScala.toSeq,
      labelCol)

  /** Hard-negative mining: top-k different-label vectors per anchor. */
  def hardNegatives(df: DataFrame, idCol: String, embCol: String,
      labelCol: String, k: Int): DataFrame =
    graft.ops.Similarity.hardNegatives(df, idCol, embCol, labelCol, k)

  /** Cross-corpus semantic contamination pairs (eval side broadcast). */
  def semanticContamination(train: DataFrame, eval: DataFrame,
      idCol: String, embCol: String, threshold: Double): DataFrame =
    graft.ops.Similarity.semanticContamination(train, eval, idCol,
      embCol, threshold)

  /** Train rows surviving the semantic contamination screen. */
  def semanticDecontaminate(train: DataFrame, eval: DataFrame,
      idCol: String, embCol: String, threshold: Double): DataFrame =
    graft.ops.Similarity.semanticDecontaminate(train, eval, idCol,
      embCol, threshold)

  /** Diagonal-Mahalanobis embedding outlier screen (top-k scores). */
  def embeddingOutliers(df: DataFrame, idCol: String, embCol: String,
      topK: Int): DataFrame =
    graft.ops.Similarity.embeddingOutliers(df, idCol, embCol, topK)

  /** Benford leading-digit conformance profile (9 digit rows). */
  def benford(df: DataFrame, valueCol: String): DataFrame =
    graft.ops.Diagnostics.benford(df, valueCol)

  /** Functional-dependency screen over candidate column pairs. */
  def functionalDependencies(df: DataFrame,
      determinants: ju.List[String],
      dependents: ju.List[String]): DataFrame =
    graft.ops.Diagnostics.functionalDependencies(df,
      determinants.asScala.toSeq.zip(dependents.asScala.toSeq))

  /** One-row t-closeness report (categorical TVD per QI group). */
  def tClosenessReport(df: DataFrame, quasiCols: ju.List[String],
      sensitiveCol: String, t: Double): DataFrame =
    graft.ops.Privacy.tClosenessReport(df, quasiCols.asScala.toSeq,
      sensitiveCol, t)

  /** Hour-of-week seasonality profile (168-cell traffic shape). */
  def seasonality(df: DataFrame, tsCol: String): DataFrame =
    graft.ops.EventStats.seasonality(df, tsCol)

  /** Time-to-event extraction for survival analysis. */
  def timeToEvent(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, targetType: String): DataFrame =
    graft.ops.EventStats.timeToEvent(df, keyCol, tsCol, typeCol,
      targetType)

  /** Kaplan-Meier survival curve over (duration, observed) rows. */
  def kaplanMeier(df: DataFrame, durationCol: String,
      observedCol: String): DataFrame =
    graft.ops.EventStats.kaplanMeier(df, durationCol, observedCol)

  /** Cohort LTV curve (cumulative revenue per acquired user by age). */
  def ltvCurve(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame =
    graft.ops.Retention.ltvCurve(df, userCol, tsCol, valueCol)

  /** RFM (recency/frequency/monetary) segmentation per key. */
  def rfm(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, nTiles: Int): DataFrame =
    graft.ops.EventStats.rfm(df, keyCol, tsCol, valueCol, nTiles)

  /** GVID container stats (header walk, frames never decode). */
  def videoStats(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    graft.ops.Media.videoStats(df, idCol, blobCol)

  /** Every Nth GVID frame as a standalone PPM row (JVM decode). */
  def videoFrameSample(df: DataFrame, idCol: String, blobCol: String,
      everyN: Int): DataFrame =
    graft.ops.Media.videoFrameSample(df, idCol, blobCol, everyN)

  /** Curation funnel from SQL-expression stage conditions. */
  def funnelReport(df: DataFrame, groupCol: String,
      names: ju.List[String], conditions: ju.List[String]): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val stages = names.asScala.toSeq.zip(
      conditions.asScala.toSeq.map(expr))
    graft.ops.Curation.funnelReport(df, groupCol, stages)
  }

  /** Per-group Kaplan-Meier curves (windows partition on the group). */
  def kaplanMeierGrouped(df: DataFrame, durationCol: String,
      observedCol: String, groupCol: String): DataFrame =
    graft.ops.EventStats.kaplanMeierGrouped(df, durationCol,
      observedCol, groupCol)

  /** Two-sample log-rank test between cohorts' survival curves. */
  def logRank(df: DataFrame, durationCol: String, observedCol: String,
      groupCol: String): DataFrame =
    graft.ops.EventStats.logRank(df, durationCol, observedCol, groupCol)

  /** Compact a store table back to one file set (staged swap). */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit =
    graft.io.CorpusStore.compactBucketed(spark, table)

  /** Row/bucket/file census of a store table. */
  def storeStats(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame =
    graft.io.CorpusStore.storeStats(spark, table)

  /** foreachBatch body of the streaming profile store sink: profile
    * one micro-batch and write its partials to `batch=<id>`
    * (overwrite — at-least-once replay of a batch is idempotent).
    * `timeCol`/`cadence` null = no time bucketing. */
  def storeBatchProfiles(batch: DataFrame, batchId: Long,
      storePath: String, keys: java.util.List[String],
      timeCol: String, cadence: String): Unit =
    graft.streaming.StreamingProfile.storeBatchProfiles(
      batch, batchId, storePath, keys.asScala.toSeq,
      timeColumn = Option(timeCol).map(t => (t, cadence)))

  /** Merge a streaming profile store to one profile per group —
    * checkpoint-aware (highest complete `batch=compact_<id>` plus
    * strictly newer trigger dirs). */
  def mergeStoredProfiles(spark: org.apache.spark.sql.SparkSession,
      storePath: String, keys: java.util.List[String]): DataFrame =
    graft.streaming.StreamingProfile.mergeStored(spark, storePath,
      keys.asScala.toSeq)

  /** Fold trigger dirs (and any previous checkpoint) <= upToBatchId
    * into one `batch=compact_<id>` checkpoint; readers see it only
    * once its _SUCCESS marker lands. */
  def compactProfileStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, upToBatchId: Long): Unit =
    graft.streaming.StreamingProfile.compactStore(spark, storePath,
      upToBatchId)

  /** GC store directories covered by a complete checkpoint. */
  def vacuumProfileStore(storePath: String): Unit =
    graft.streaming.StreamingProfile.vacuumStore(storePath)

  /** Grow a fingerprint store with a screened batch. */
  def appendFingerprints(docs: DataFrame, table: String,
      textCol: String): Unit =
    graft.ops.Dedup.appendFingerprints(docs, table, textCol)

  /** Grow a MinHash store with a new batch (ids assumed fresh). */
  def appendMinHashReference(docs: DataFrame, table: String,
      idCol: String, textCol: String, numHashes: Int, bands: Int,
      shingleK: Int, maxBucketSize: Int): Unit =
    graft.ops.Dedup.appendMinHashReference(docs, table, idCol, textCol,
      numHashes, bands, shingleK, maxBucketSize)

  /** Grow an image-hash store with a new batch. */
  def appendImageHashReference(docs: DataFrame, idCol: String,
      blobCol: String, table: String, useDHash: Boolean): Unit =
    graft.ops.Media.appendImageHashReference(docs, idCol, blobCol,
      table, useDHash)

  /** Grow an IVF index under its frozen stored codebook. */
  def appendToIvfIndex(corpus: DataFrame, idCol: String, embCol: String,
      table: String): Unit =
    graft.ops.Similarity.appendToIvfIndex(corpus, idCol, embCol, table)

  /** Grow a novelty gram store with newly ingested documents. */
  def appendNoveltyReference(reference: DataFrame, textCol: String,
      n: Int, table: String): Unit =
    graft.ops.TextOps.appendNoveltyReference(reference, textCol, n, table)

  /** Persist distinct normalized-text fingerprints as a store table. */
  def writeFingerprintReference(reference: DataFrame, textCol: String,
      table: String, numBuckets: Int): Unit =
    graft.ops.Dedup.writeFingerprintReference(reference, textCol, table,
      numBuckets)

  /** Keep rows whose fingerprint is NOT in the store (batch or stream). */
  def filterUnseenAgainstStore(docs: DataFrame, table: String,
      textCol: String): DataFrame =
    graft.ops.Dedup.filterUnseenAgainstStore(docs, table, textCol)

  /** Deterministic md5 negative sampling over a dense id domain. */
  def negativeSamples(df: DataFrame, idCol: String, k: Int,
      domain: DataFrame): DataFrame =
    graft.ops.Sampling.negativeSamples(df, idCol, k, domain)

  /** Persist an IVF ANN index (codebook + bucketed inverted lists). */
  def writeIvfIndex(corpus: DataFrame, idCol: String, embCol: String,
      table: String, nCentroids: Int, iterations: Int,
      numBuckets: Int): Unit =
    graft.ops.Similarity.writeIvfIndex(corpus, idCol, embCol, table,
      nCentroids, iterations, numBuckets)

  /** Approximate top-k search against a stored IVF index. */
  def ivfTopKStored(queries: DataFrame, table: String, idCol: String,
      embCol: String, k: Int, nProbe: Int): DataFrame =
    graft.ops.Similarity.ivfTopKStored(queries, table, idCol, embCol,
      k, nProbe)
}
