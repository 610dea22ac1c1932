package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for skewed / large-scale pipelines. The reference never
  * joins (profile merge covers its multi-source story, SURVEY §2.b), but a
  * 100 TB training-data pipeline does — these are the patterns AQE cannot
  * always reach:
  *
  *  - [[saltedJoin]]: hot keys in a shuffle join put one reducer on the
  *    critical path. Salting splits every large-side key into
  *    `saltBuckets` sub-partitions and replicates the matching small-side
  *    rows across them, so a key's rows spread over `saltBuckets` tasks.
  *    (AQE's skew-join split handles sort-merge joins after the fact;
  *    salting is the declarative form that also composes with
  *    aggregations downstream.)
  *  - [[rangeBucketJoin]]: inequality/band joins (value BETWEEN lo AND hi)
  *    naively plan as BroadcastNestedLoopJoin over the whole cross
  *    product. Bucketing both sides by range turns them into an equi-join
  *    on the bucket id with a residual filter.
  */
object Joins {

  /** The blocked joins' STREAM side carries the quadratic in-block
    * scoring — spread it when the source scan is narrower than the
    * session parallelism (no-op at scale, [[Parallelism.spreadIfNarrow]]).
    */
  private def spreadIfNarrow(df: DataFrame): DataFrame =
    Parallelism.spreadIfNarrow(df)

  /** Equi-join `large` with `small` on `key`, salted into `saltBuckets`
    * sub-keys. Result rows equal the plain join exactly; the shuffle key
    * is (key, salt) so no single reducer owns a hot key. The salt on the
    * large side is a deterministic hash of the whole row (stable under
    * retries); the small side replicates `saltBuckets` times.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1)
    val largeCols = large.columns.toSeq
    val salted = large.withColumn("__salt",
      pmod(xxhash64(largeCols.map(col): _*), lit(saltBuckets.toLong)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until saltBuckets)
        .map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Band join: `left.valueCol BETWEEN right.loCol AND right.hiCol`, with
    * both sides bucketed by `bucketWidth` so the join is an equi-join on
    * the bucket id plus a residual range filter. Each right row lands in
    * every bucket its [lo, hi] interval overlaps — correct as long as
    * interval width is bounded (bucketsPerRow <= (hi-lo)/bucketWidth + 2).
    */
  def rangeBucketJoin(
      left: DataFrame,
      right: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    val lb = left.withColumn("__bucket",
      floor(col(valueCol) / bucketWidth).cast("long"))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Skew-routed equi-join: probes the large side's key histogram with
    * ONE map-side-combined aggregate ([[Diagnostics.keySkew]] top-1 —
    * shuffle carries distinct keys, not rows) and picks the physical
    * strategy from the measurement: a top key owning at least
    * `skewThreshold` of the rows routes through [[saltedJoin]];
    * otherwise a plain equi-join (AQE's skew splitting handles the mild
    * regime). The probe is the cheap insurance the verdict pattern
    * demands: commit a 100 TB shuffle to a key only after measuring it.
    */
  def autoJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int = 16,
      skewThreshold: Double = 0.05): DataFrame = {
    require(skewThreshold > 0 && skewThreshold <= 1,
      s"skewThreshold must be in (0,1], got $skewThreshold")
    val top = Diagnostics.keySkew(large, Seq(key), 1).collect()
    val topShare =
      if (top.isEmpty) 0.0 else top.head.getAs[Double]("share")
    if (topShare >= skewThreshold)
      saltedJoin(large, small, key, saltBuckets)
    else large.join(small, key)
  }

  /** As-of join: for each left row, the latest right row with
    * `rightTime <= leftTime` per key — the standard event-time enrichment
    * the reference's host pipelines need.
    *
    * This default entry point is SKEW-SAFE: it probes the right side's
    * time range with one bounded 1-row aggregate, derives a bucket width
    * that spreads each key over ~[[AutoBuckets]] time buckets, and runs
    * [[asOfJoinBucketed]] — so a hot key (one user owning half the events)
    * cannot serialize on a single reducer. When the probe finds a
    * degenerate range (empty right side, a single instant, or an all-null
    * time column) bucketing cannot spread work and it falls back to
    * [[asOfJoinWindowed]], which is equivalent there.
    *
    * Callers who know their key cardinality dwarfs their hottest key can
    * use [[asOfJoinWindowed]] directly and skip the probe job; callers who
    * know their time scale can pick the width via [[asOfJoinBucketed]].
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val mm = right
      .agg(min(EventTime.seconds(right, rightTime)),
        max(EventTime.seconds(right, rightTime)))
      .head()
    if (mm.isNullAt(0) || mm.getDouble(0) == mm.getDouble(1))
      asOfJoinWindowed(left, right, key, leftTime, rightTime, payloadCols)
    else {
      val width = (mm.getDouble(1) - mm.getDouble(0)) / AutoBuckets
      asOfJoinBucketed(left, right, key, leftTime, rightTime, payloadCols, width)
    }
  }

  /** Target bucket count for [[asOfJoin]]'s auto-derived width: a key with
    * N time-uniform rows sees ~N/4096 rows per (key, bucket) task, and the
    * pass-2 carry window is bounded at ~4096 rows per key.
    */
  private val AutoBuckets = 4096.0

  /** Windowed as-of join: the small-data fast path — a single union +
    * per-key window (one shuffle on `key`, no range probe job). The whole
    * of a key's rows sort on ONE reducer, so use this only when no key is
    * hot; [[asOfJoin]] is the skew-safe default.
    *
    * Right rows carry their payloads as ONE struct column and
    * `last(ignoreNulls)` runs over that struct: the struct is non-null for
    * every right row, so the latest matching right row wins even when its
    * payload values are null (carrying payloads individually would leak a
    * stale non-null payload from an older row past a newer null).
    */
  def asOfJoinWindowed(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns.toSeq
    val pType = StructType(payloadCols.map(c => right.schema(c)))
    val lAll = left
      .withColumn("__t", col(leftTime))
      .withColumn("__isLeft", lit(true))
      .withColumn("__p", lit(null).cast(pType))
    // align schemas: right lacks the non-key left columns
    val rTagged = right.select(col(key), col(rightTime).as("__t"),
      lit(false).as("__isLeft"), struct(payloadCols.map(col): _*).as("__p"))
    val rAll = leftCols.filterNot(_ == key).foldLeft(rTagged)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAll.unionByName(rAll.select(lAll.columns.toIndexedSeq.map(col): _*))
    // right rows sort before left rows at equal timestamps so an exact
    // timestamp match is visible to the left row
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__isLeft"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__f", last(col("__p"), ignoreNulls = true).over(w))
    filled.filter(col("__isLeft"))
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__f.$c").as(c)): _*)
  }

  /** Skew-safe as-of join: identical semantics to [[asOfJoinWindowed]],
    * but the per-key window is replaced by a TWO-PASS time-bucketed plan
    * so a hot key (one user owning half the events) no longer serializes
    * on a single reducer. [[asOfJoin]] routes here with an auto-derived
    * width.
    *
    *  - Pass 1 (within bucket): the union+window runs partitioned by
    *    (key, bucket) — a hot key's events spread over its time buckets,
    *    so max task work is max events per (key, bucket), not per key.
    *  - Pass 2 (carry across buckets): the last right payload of each
    *    (key, bucket) is reduced by one map-side-combinable aggregate
    *    (`max_by` over right event time), then carried forward with a
    *    per-key window over BUCKETS — O(timeRange / bucketWidth) rows per
    *    key regardless of event counts, the documented skew bound.
    *    A left row in bucket t takes its within-bucket match if one
    *    exists, else the carried payload from the latest right bucket
    *    strictly before t (any right row there is strictly earlier in
    *    time than the whole of bucket t, so the as-of ordering holds).
    *
    * `bucketWidth` is in the units of [[EventTime.seconds]] — seconds
    * for timestamp columns (micro-precision, ANSI-safe via `unix_micros`
    * rather than a timestamp→double cast), the raw value for numeric
    * time columns. Choose it so a hot key's densest bucket fits a task
    * comfortably; correctness does not depend on the choice. Rows with a
    * NULL left time get NULL payloads (same as [[asOfJoin]]).
    */
  def asOfJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      bucketWidth: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.StructType
    require(bucketWidth > 0, "bucketWidth must be positive")
    val leftCols = left.columns.toSeq
    val pType = StructType(payloadCols.map(c => right.schema(c)))
    def bucketOf(t: Column): Column =
      floor(t / lit(bucketWidth)).cast("long")
    val lSecs = EventTime.seconds(left, leftTime)
    val rSecs = EventTime.seconds(right, rightTime)

    // pass 1: within-bucket as-of — the asOfJoin union+window shape with
    // the bucket id added to BOTH the window partition key and the union,
    // spreading a hot key across its buckets
    val lAll = left
      .withColumn("__t", lSecs)
      .withColumn("__bucket", bucketOf(lSecs))
      .withColumn("__isLeft", lit(true))
      .withColumn("__p", lit(null).cast(pType))
    val rTagged = right.select(col(key), rSecs.as("__t"),
      bucketOf(rSecs).as("__bucket"),
      lit(false).as("__isLeft"), struct(payloadCols.map(col): _*).as("__p"))
    val rAll = leftCols.filterNot(_ == key).foldLeft(rTagged)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAll.unionByName(rAll.select(lAll.columns.toIndexedSeq.map(col): _*))
    val wIn = Window.partitionBy(col(key), col("__bucket"))
      .orderBy(col("__t"), col("__isLeft"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = unioned
      .withColumn("__w", last(col("__p"), ignoreNulls = true).over(wIn))
      .filter(col("__isLeft"))

    // pass 2: last right payload per (key, bucket) — map-side combinable
    // aggregate, then a bucket-granular carry-forward per key. Left-bucket
    // marker rows sort BEFORE same-bucket right rows (__fromRight asc) so
    // a marker only sees strictly-earlier buckets.
    val bucketLast = rTagged
      .groupBy(col(key), col("__bucket"))
      .agg(max_by(col("__p"), col("__t")).as("__p"))
      .withColumn("__fromRight", lit(true))
    val leftBuckets = left
      .select(col(key), bucketOf(lSecs).as("__bucket")).distinct()
      .withColumn("__p", lit(null).cast(pType))
      .withColumn("__fromRight", lit(false))
    val wCarry = Window.partitionBy(col(key))
      .orderBy(col("__bucket"), col("__fromRight"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = bucketLast.unionByName(leftBuckets)
      .withColumn("__carry", last(col("__p"), ignoreNulls = true).over(wCarry))
      .filter(!col("__fromRight"))
      .select(col(key), col("__bucket"), col("__carry"))

    within.join(carry, Seq(key, "__bucket"), "left")
      .withColumn("__f", coalesce(col("__w"), col("__carry")))
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__f.$c").as(c)): _*)
  }

  /** Fuzzy (edit-distance) record-linkage join: pairs of rows whose
    * string keys are within `maxDist` Levenshtein edits. The classic
    * entity-resolution primitive (name/address matching, near-key
    * reconciliation).
    *
    * Blocking makes it scale: each key expands to its deterministic
    * block signatures — (prefix, length-band) cells for every length
    * band the key COULD match under `maxDist` edits — and only rows
    * sharing a block meet in the equi-join, where the exact
    * codegen'd `levenshtein` decides. Every true match shares a block
    * (an edit changes length by <= maxDist and the first
    * `prefixLen` chars only if it lands there; emitting BOTH sides'
    * prefixes under edits <= maxDist keeps recall exact for
    * prefix-region edits), so recall is exact for maxDist <=
    * prefixLen deletions/insertions at the front — and the default
    * prefixLen=1 block on the first character plus length bands is
    * the standard Soundex-free compromise: exact for all edits that
    * keep the first character, documented miss for first-character
    * substitutions unless `symmetricPrefixes` stays on (default),
    * which also blocks on the key with its first character dropped,
    * restoring exact recall for single first-char edits.
    *
    * Output: one row per matching pair — left id/key, right id/key,
    * `dist`. Pairs are distinct even when multiple blocks agree
    * (dedup happens on ids before the distance filter's final
    * projection).
    */
  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      keyCol: String,
      maxDist: Int,
      prefixLen: Int = 1,
      symmetricPrefixes: Boolean = true): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    // bands are ASYMMETRIC: the left side emits only its own length
    // band, the right side the three adjacent ones — |band_l - band_r|
    // <= 1 guarantees band_l is among the right's three, so recall is
    // unchanged while every pair shares 3x fewer band keys (the join's
    // output row count, the real cost, drops with it)
    def blocks(df: DataFrame, side: String,
        threeBands: Boolean): DataFrame = {
      val k = col(keyCol)
      val pfx = substring(k, 1, prefixLen)
      val pfxDrop = substring(k, 1 + maxDist, prefixLen)
      val prefixes =
        if (symmetricPrefixes && maxDist > 0) array(pfx, pfxDrop)
        else array(pfx)
      // length bands of width (maxDist+1): a pair within maxDist edits
      // differs by <= maxDist in length
      val bandW = maxDist + 1
      val band = floor(length(k) / bandW)
      val bandsOf: Column => Column =
        if (threeBands) p => array(concat(p, lit(":"), band),
          concat(p, lit(":"), band - 1), concat(p, lit(":"), band + 1))
        else p => array(concat(p, lit(":"), band))
      df.filter(k.isNotNull)
        .select(col(idCol).as(s"${side}_id"), k.as(s"${side}_key"),
          array_distinct(flatten(transform(prefixes, bandsOf)))
            .as(s"__${side}_blocks"))
        .select(col(s"${side}_id"), col(s"${side}_key"),
          col(s"__${side}_blocks"),
          explode(col(s"__${side}_blocks")).as("__block"))
    }
    // the stream side carries the quadratic in-block scoring: spread it
    // when the source scan is narrower than the session parallelism
    // (no-op at scale — see spreadIfNarrow)
    val lb = spreadIfNarrow(blocks(left, "left", threeBands = false))
    val rb = blocks(right, "right", threeBands = true)
    lb.join(rb, Seq("__block"))
      // a pair meets once per SHARED block (<= 6): keep it only in the
      // smallest shared block — map-side dedup, so candidate pairs
      // never shuffle (the only exchange carries the skinny exploded
      // block rows, not the quadratic in-block pair stream)
      .filter(col("__block") === array_min(
        array_intersect(col("__left_blocks"), col("__right_blocks"))))
      // bounded variant: the DP abandons a row once every cell exceeds
      // the threshold (returns -1), so far-apart candidate pairs cost
      // O(maxDist * len) instead of O(len^2)
      .withColumn("dist",
        levenshtein(col("left_key"), col("right_key"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("left_id"), col("left_key"),
        col("right_id"), col("right_key"), col("dist"))
  }

  /** Blocked record linkage by Jaro-Winkler similarity: pairs from
    * `left` x `right` whose keys block together (same
    * `prefixLen`-CHARACTER prefix — substring()/length() count
    * characters, so multibyte keys block on characters even though
    * the similarity itself scores bytes; the DuckDB oracle blocks
    * identically — length bands within one step of width `bandWidth`)
    * and
    * score `jaro_winkler >= minSim` — the name/title matcher for
    * entity resolution, where [[fuzzyJoin]]'s edit-distance counts
    * typos but misses that "Jonathan Smythe" and "Jonathon Smith" are
    * the same person. Keys should be pre-normalized (case, NFC —
    * [[graft.functions.JaroWinkler]] is byte-exact by design, matching
    * the DuckDB oracle).
    *
    * Recall contract — UNLIKE [[fuzzyJoin]], blocking here is the
    * standard record-linkage recall/cost dial, not a guarantee:
    * Jaro-Winkler has no block-compatible exact bound (a high score
    * CAN survive a first-byte mismatch that prefix blocking prunes).
    * The default (2-byte prefix, ±1 length band) is the classic
    * Fellegi-Sunter blocking; widen `bandWidth` / shrink `prefixLen`
    * to trade cost for recall.
    *
    * Scale shape: the only exchange carries the skinny exploded block
    * rows; the left side emits ONE block per key and the right side
    * its three adjacent bands, so a pair meets exactly once and the
    * candidate stream needs no dedup. Scoring is the codegen'd
    * [[graft.functions.JaroWinkler]] on the blocked candidates only —
    * never all pairs.
    */
  def nameMatchPairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      keyCol: String,
      minSim: Double,
      prefixLen: Int = 2,
      bandWidth: Int = 4): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0,
      s"minSim must be in (0, 1], got $minSim")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    require(bandWidth >= 1, s"bandWidth must be >= 1, got $bandWidth")
    def blocks(df: DataFrame, side: String,
        threeBands: Boolean): DataFrame = {
      val k = col(keyCol)
      val pfx = substring(k, 1, prefixLen)
      val band = floor(length(k) / bandWidth)
      val bands =
        if (threeBands) array(concat(pfx, lit(":"), band),
          concat(pfx, lit(":"), band - 1), concat(pfx, lit(":"), band + 1))
        else array(concat(pfx, lit(":"), band))
      df.filter(k.isNotNull && length(k) >= prefixLen)
        .select(col(idCol).as(s"${side}_id"), k.as(s"${side}_key"),
          explode(bands).as("__block"))
    }
    spreadIfNarrow(blocks(left, "left", threeBands = false))
      .join(blocks(right, "right", threeBands = true), Seq("__block"))
      .withColumn("sim",
        graft.functions.jaro_winkler(col("left_key"), col("right_key")))
      .filter(col("sim") >= minSim)
      .select(col("left_id"), col("left_key"),
        col("right_id"), col("right_key"), col("sim"))
  }

  /** [[nameMatchPairs]] with a CALLER-SUPPLIED blocking column — the
    * textbook Fellegi-Sunter shape: block on a higher-entropy exact
    * field (zip code, birth year, normalized phone) and fuzzy-match
    * the name within the block. Prefix blocking (the other overload)
    * degrades when keys share low-entropy openings ("the ...",
    * honorifics, a catalog's color vocabulary); a good external block
    * key keeps every block executor-sized regardless of how the NAMES
    * distribute. Pairs join on `blockCol` equality (NULL blocks drop
    * — NULL never equals NULL in an equi-join, and an unblockable
    * record is a data-quality problem upstream), score with the
    * codegen'd [[graft.functions.JaroWinkler]], and keep
    * `sim >= minSim`.
    */
  def nameMatchPairsBlocked(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      keyCol: String,
      blockCol: String,
      minSim: Double): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0,
      s"minSim must be in (0, 1], got $minSim")
    def side(df: DataFrame, s: String): DataFrame =
      df.filter(col(keyCol).isNotNull && col(blockCol).isNotNull)
        .select(col(idCol).as(s"${s}_id"), col(keyCol).as(s"${s}_key"),
          col(blockCol).as("__block"))
    side(left, "left").join(side(right, "right"), Seq("__block"))
      .withColumn("sim",
        graft.functions.jaro_winkler(col("left_key"), col("right_key")))
      .filter(col("sim") >= minSim)
      .select(col("left_id"), col("left_key"),
        col("right_id"), col("right_key"), col("sim"))
  }
}
