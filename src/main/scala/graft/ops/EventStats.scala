package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-decayed per-key event statistics — the recency-weighted
  * activity scores behind engagement ranking and freshness-aware
  * sampling: each event contributes `value * 2^(-(age / half_life))`,
  * where age is measured back from the KEY'S OWN most recent event, so
  * the score is replay-stable (no wall-clock `now` in the formula —
  * the same events always produce the same score).
  *
  * Scale shape: the per-key max-time pass is a window aggregate over
  * the same hash partitioning the final groupBy needs — Catalyst
  * reuses the exchange, so the events shuffle ONCE; the decay weights
  * are a map-side projection and the score is one map-side-combined
  * aggregate. No sort: max-over-partition and sum need no ordering.
  */
object EventStats {

  /** Per-key decayed score over events: one row per key with
    * `ewma_score = sum(value * 2^((t - max_t) / half_life))`,
    * `n_events`, and `last_t` (epoch micros). `halfLifeSeconds` is
    * the age at which an event's contribution halves. Events with a
    * NULL value contribute nothing (their time still anchors
    * recency).
    */
  def decayedScore(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      halfLifeSeconds: Double): DataFrame = {
    require(halfLifeSeconds > 0,
      s"halfLifeSeconds must be > 0, got $halfLifeSeconds")
    val t = EventTime.micros(df, tsCol)
    val w = Window.partitionBy(col(keyCol))
    val withT = df.select(col(keyCol), t.as("__t"),
      col(valueCol).cast("double").as("__v"))
      .withColumn("__maxt", max(col("__t")).over(w))
    withT
      .groupBy(col(keyCol))
      .agg(
        sum(coalesce(col("__v"), lit(0.0)) *
          pow(lit(2.0), (col("__t") - col("__maxt")).cast("double") /
            lit(halfLifeSeconds * 1e6))).as("ewma_score"),
        count(lit(1)).as("n_events"),
        max(col("__t")).as("last_t"))
  }

  /** Decayed EVENT COUNT per key (every event weighs 1): the
    * recency-weighted activity level. Same plan shape as
    * [[decayedScore]].
    */
  def decayedCount(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      halfLifeSeconds: Double): DataFrame =
    decayedScore(df.withColumn("__one", lit(1.0)), keyCol, tsCol,
      "__one", halfLifeSeconds)
      .withColumnRenamed("ewma_score", "decayed_count")

  /** Per-event trailing-window statistics: for every event, the count /
    * sum / mean of the key's events inside the PRECEDING
    * `windowSeconds` (inclusive of the current event) — the rolling
    * rate/velocity feature behind abuse detection and activity
    * features, computed exactly (no bucketing error).
    *
    * Scale shape: one hash exchange on the key plus a per-partition
    * sort — a single RANGE window over event-time micros; no
    * self-join, no bucket explosion. Ties in event time all see the
    * full tied set (SQL RANGE semantics, deterministic on replay).
    * Output: every input row + `t_micros` (epoch micros; a name no
    * raw event schema uses, so input columns never collide),
    * `n_window`, `sum_window`, `mean_window`.
    */
  def rollingWindowStats(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0,
      s"windowSeconds must be > 0, got $windowSeconds")
    val t = EventTime.micros(df, tsCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"))
      .rangeBetween(-windowSeconds * 1000000L, Window.currentRow)
    df.withColumn("__t", t)
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window",
        sum(coalesce(col(valueCol).cast("double"), lit(0.0))).over(w))
      .withColumn("mean_window", col("sum_window") / col("n_window"))
      .withColumnRenamed("__t", "t_micros")
  }

  /** Trending items: the top-k item types per fixed time bucket by
    * event count, with rank. Two-level aggregation — events collapse
    * to (bucket, item, count) cells map-side-combined in one exchange;
    * the per-bucket top-k is a bounded window over the CELL table
    * (|buckets| x |items| rows, not events). Buckets are epoch-aligned
    * (`floor(t / width)`), deterministic ties by item ascending.
    * Output: bucket_start (epoch micros), item, n, rank (1-based).
    */
  def trendingItems(
      df: DataFrame,
      tsCol: String,
      itemCol: String,
      bucketSeconds: Long,
      k: Int): DataFrame = {
    require(bucketSeconds > 0,
      s"bucketSeconds must be > 0, got $bucketSeconds")
    require(k >= 1, s"k must be >= 1, got $k")
    val micros = bucketSeconds * 1000000L
    val cells = df
      .filter(col(itemCol).isNotNull)
      .select(
        (floor(EventTime.micros(df, tsCol) / micros) * micros)
          .as("bucket_start"),
        col(itemCol).as("item"))
      .groupBy(col("bucket_start"), col("item"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("bucket_start"))
      .orderBy(col("n").desc, col("item").asc)
    cells.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Hour-of-week seasonality profile of an event stream: every event
    * buckets into one of the 168 (day-of-week, hour) UTC cells; per
    * non-empty cell — n, share of total traffic, and `lift` =
    * share × 168 (the cell's multiple of uniform traffic; capacity
    * planning reads peaks, anomaly screens read troughs). Both time
    * parts derive from epoch micros by INTEGER arithmetic
    * (dow 0 = Monday via `(epoch_day + 3) mod 7` — 1970-01-01 was a
    * Thursday) so any engine replays the bucketing exactly — calendar
    * functions differ across engines on week-start conventions.
    *
    * Scale shape: ONE map-side-combined aggregate collapses the
    * corpus to ≤ 168 cells; the grand total rides back on a broadcast
    * 1-row cross join. Nothing event-sized survives the exchange.
    */
  def seasonality(df: DataFrame, tsCol: String): DataFrame = {
    val t = EventTime.micros(df, tsCol)
    val cells = df
      .filter(t.isNotNull)
      .select(t.as("__t"))
      .selectExpr("pmod((__t div 86400000000) + 3, 7) AS dow",
        "(__t div 3600000000) % 24 AS hour")
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val total = cells.agg(sum(col("n")).as("__total"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hour"), col("n"),
        (col("n").cast("double") / col("__total")).as("share"),
        (col("n") * lit(168.0) / col("__total")).as("lift"))
  }

  /** Sample autocorrelation of an evenly-indexed series at lags
    * 1..maxLag: r_lag = sum((x_t - mean)(x_{t+lag} - mean)) /
    * sum((x_t - mean)^2), with the mean/denominator over the FULL
    * series — the standard sample ACF, the periodicity screen that
    * tells a traffic monitor its cycle length (a daily rhythm spikes
    * r at lag 24 on hourly buckets) and a drift monitor whether
    * "anomalies" are just seasonality. Rows with a NULL index/value
    * drop; the series is assumed dense (use [[eventAcf]] to build a
    * gap-filled series from raw events) — a missing index contributes
    * no pair at the lags that would touch it. Returns one row for
    * EVERY lag 1..maxLag: lag, n_pairs (0 when the lag has no pair —
    * e.g. it exceeds the series span), acf (NULL for a constant
    * series or a zero-pair lag) — callers iterating expected lags see
    * explicit empties, never gaps.
    *
    * Scale shape: the mean/denominator reduce in one aggregate and
    * ride back as a broadcast 1-row; the lagged products come from an
    * equi-join of the series with itself on (t + lag) — lags explode
    * against a literal array, so the join carries |series| x maxLag
    * cells hash-partitioned on the shifted index, never a global-sort
    * window (the naive `lag().over(orderBy(t))` funnels the whole
    * series through ONE task).
    */
  def acf(
      series: DataFrame,
      indexCol: String,
      valueCol: String,
      maxLag: Int): DataFrame = {
    // the persisted centered layout lives until the session drops it;
    // long-lived sessions should use [[acfReleasable]]
    acfReleasable(series, indexCol, valueCol, maxLag)._1
  }

  /** [[acf]] plus a release() thunk for the persisted centered series.
    * The centered frame feeds THREE consumers (denominator, lag left
    * side, lag right side) — without the persist each would recompute
    * the series from its lineage, which for [[eventAcf]] means
    * re-aggregating the raw event corpus three times.
    */
  def acfReleasable(
      series: DataFrame,
      indexCol: String,
      valueCol: String,
      maxLag: Int): (DataFrame, () => Unit) = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val s = series
      .filter(col(indexCol).isNotNull && col(valueCol).isNotNull)
      .select(col(indexCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__v"))
    val mu = s.agg(avg(col("__v")).as("__mu"))
    val centered = s.crossJoin(broadcast(mu))
      .select(col("__t"), (col("__v") - col("__mu")).as("__d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val den = centered.agg(sum(col("__d") * col("__d")).as("__den"))
    val a = centered
      .select(col("__t"), col("__d"),
        explode(array((1 to maxLag).map(l => lit(l)): _*)).as("lag"))
    val b = centered
      .select(col("__t").as("__bt"), col("__d").as("__bd"))
    val agg = a.join(b, col("__t") + col("lag") === col("__bt"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__d") * col("__bd")).as("__num"))
    // left-join the aggregated pairs against the literal lag list so
    // zero-pair lags surface as (n_pairs=0, acf NULL) instead of
    // silently disappearing (the groupBy alone can only emit lags
    // that produced a pair)
    val lagList = series.sparkSession.range(1L, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    val out = lagList.join(agg, Seq("lag"), "left")
      .crossJoin(broadcast(den))
      .select(col("lag").cast("int").as("lag"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("__den") > 0, col("__num") / col("__den")).as("acf"))
    (out, () => { centered.unpersist(); () })
  }

  /** [[acf]] over the per-bucket EVENT COUNTS of a raw event stream:
    * timestamps bucket to `floor(t / bucketSeconds)`, empty buckets
    * between the first and last event count as genuine zeros (a
    * quiet hour is data, not a gap), and the dense series feeds the
    * lag join. The only driver state is the two bucket bounds (one
    * 1-row collect); the dense index is a distributed `range`.
    */
  def eventAcf(
      df: DataFrame,
      tsCol: String,
      bucketSeconds: Long,
      maxLag: Int): DataFrame =
    acf(eventSeries(df, tsCol, bucketSeconds), "t", "n", maxLag)

  /** DENSE per-bucket event-count series from a raw event stream:
    * one row per `bucketSeconds` bucket from the first event to the
    * last, `n = 0` for quiet buckets (a quiet hour is data, not a
    * gap). The series the lag-based ops ([[acf]], [[decompose]])
    * consume. The only driver state is the two bucket bounds (one
    * 1-row collect); the dense index is a distributed `range`.
    */
  def eventSeries(
      df: DataFrame,
      tsCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1,
      s"bucketSeconds must be >= 1, got $bucketSeconds")
    val t = EventTime.micros(df, tsCol)
    val counts = df
      .filter(t.isNotNull)
      .select(t.as("__tm"))
      // FLOOR integer division (micros are exact longs; a double
      // quotient could round across a bucket boundary, and a bare
      // `div` truncates toward zero — pre-1970 negative micros would
      // land one bucket high and diverge from the oracle's floor `//`)
      .selectExpr(("(__tm - pmod(__tm, " +
        s"${bucketSeconds * 1000000L})) div " +
        s"${bucketSeconds * 1000000L} AS t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("n"))
    val bounds = counts
      .agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
      .collect()(0)
    if (bounds.isNullAt(0)) return counts
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val dense = df.sparkSession.range(0L, hi - lo + 1L)
      .select((col("id") + lit(lo)).as("t"))
    dense.join(counts, Seq("t"), "left")
      .select(col("t"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Classical additive decomposition of an evenly-indexed series:
    * `v = trend + seasonal + residual` — trend is the centered moving
    * average over `2 * trendWindow + 1` points (NULL at the edges
    * where the window is incomplete: extrapolated trend is a lie),
    * seasonal is the mean DETRENDED value per phase `t mod period`
    * (so the daily shape is measured net of the week's drift, not
    * polluted by it), residual is what neither explains. The
    * anomaly-screen prerequisite: a raw threshold on `v` pages every
    * midnight; one on `residual` pages on real anomalies. Rows with a
    * NULL index/value drop; the series is assumed dense
    * ([[eventSeries]] builds one). Returns one row per index:
    * t, v, trend, seasonal, residual.
    *
    * Scale shape: the moving average comes from an offsets explode
    * (each row contributes to its 2w+1 neighbor positions) plus one
    * hash aggregate on the target index — never a global-sort window
    * (`avg().over(orderBy(t).rowsBetween(-w, w))` funnels the whole
    * series through ONE task); the per-phase seasonal means are a
    * `period`-row broadcast.
    */
  def decompose(
      series: DataFrame,
      indexCol: String,
      valueCol: String,
      period: Int,
      trendWindow: Int): DataFrame =
    // the persisted trend layout lives until the session drops it;
    // long-lived sessions should use [[decomposeReleasable]]
    decomposeReleasable(series, indexCol, valueCol, period,
      trendWindow)._1

  /** [[decompose]] plus a release() thunk for the persisted
    * (series + trend) layout. The joined frame feeds TWO consumers
    * (the per-phase seasonal means and the output projection) —
    * without the persist each recomputes the series lineage, which
    * for an [[eventSeries]] input means re-aggregating the raw event
    * corpus.
    */
  def decomposeReleasable(
      series: DataFrame,
      indexCol: String,
      valueCol: String,
      period: Int,
      trendWindow: Int): (DataFrame, () => Unit) = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(trendWindow >= 1,
      s"trendWindow must be >= 1, got $trendWindow")
    val w = trendWindow
    val s = series
      .filter(col(indexCol).isNotNull && col(valueCol).isNotNull)
      .select(col(indexCol).cast("long").as("t"),
        col(valueCol).cast("double").as("v"))
    val trend = s
      .select(col("v"),
        explode(array((-w to w).map(o => col("t") + lit(o)): _*))
          .as("t"))
      .groupBy(col("t"))
      .agg(count(lit(1)).as("__k"), avg(col("v")).as("__ma"))
      .select(col("t"),
        when(col("__k") === (2 * w + 1), col("__ma")).as("trend"))
    val withTrend = s.join(trend, Seq("t"), "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seasonal = withTrend
      .filter(col("trend").isNotNull)
      .groupBy(pmod(col("t"), lit(period.toLong)).as("__phase"))
      .agg(avg(col("v") - col("trend")).as("seasonal"))
    val out = withTrend
      .join(broadcast(seasonal),
        pmod(col("t"), lit(period.toLong)) === col("__phase"), "left")
      .select(col("t"), col("v"), col("trend"), col("seasonal"),
        (col("v") - col("trend") - col("seasonal")).as("residual"))
    (out, () => { withTrend.unpersist(); () })
  }

  /** Robust trend of an indexed SERIES: the Theil-Sen slope (median
    * of pairwise slopes — up to 29% of the points can be arbitrarily
    * corrupt before it budges) next to the OLS slope it sanity-checks
    * (one outlier hour can own OLS; when the two disagree, believe
    * Theil-Sen and go find the outlier). One row: n, n_pairs,
    * theil_sen, ols — EMPTY when n < 2 (no pair exists).
    *
    * Scale contract, ENFORCED by a measured 1-row count probe (the
    * [[graft.ops.Similarity.knnLabelNoise]] auto-route precedent —
    * the r13 review found the previous doc-only contract let a caller
    * point this at an unbucketed event stream and get a silent O(n^2)
    * corpus self-cross-join):
    *  - n <= maxExactPoints: the EXACT median of all n(n-1)/2
    *    pairwise slopes via [[FeatureScale.exactQuantiles]] (the
    *    slope table feeds the same distributed prefix sum every rank
    *    statistic here uses). The default budget (20k points = 200M
    *    pairs) comfortably covers bucketed series — a year of hours
    *    is 8.8k points.
    *  - n > maxExactPoints: SAMPLED Theil-Sen — rows hash-bucket by
    *    `xxhash64(t) mod ceil(n / pairBucketSize)` and pairs form
    *    only WITHIN buckets (an equi-join, never a cartesian), so
    *    ~n * pairBucketSize / 2 uniform pseudo-random pairs feed the
    *    same exact-median machinery. The estimate converges to the
    *    full-pair median (pairs are an unbiased sample of the slope
    *    distribution); n_pairs reports the sampled count so the
    *    regime is visible in the output.
    * OLS is one moment aggregate either way.
    */
  def trendSlope(
      series: DataFrame,
      indexCol: String,
      valueCol: String,
      maxExactPoints: Long = 20000L,
      pairBucketSize: Int = 64): DataFrame =
    // the persisted series layout lives until the session drops it;
    // long-lived sessions should use [[trendSlopeReleasable]]
    trendSlopeReleasable(series, indexCol, valueCol, maxExactPoints,
      pairBucketSize)._1

  /** [[trendSlope]] plus a release() thunk for the persisted series
    * projection. The series feeds FOUR consumers (the route probe,
    * the tmin centering aggregate, and both sides of the pair join) —
    * without the persist each recomputes the series lineage, which
    * for an [[eventSeries]] input means re-aggregating the raw event
    * corpus four times.
    */
  def trendSlopeReleasable(
      series: DataFrame,
      indexCol: String,
      valueCol: String,
      maxExactPoints: Long = 20000L,
      pairBucketSize: Int = 64): (DataFrame, () => Unit) = {
    require(maxExactPoints >= 2,
      s"maxExactPoints must be >= 2, got $maxExactPoints")
    require(pairBucketSize >= 2,
      s"pairBucketSize must be >= 2, got $pairBucketSize")
    val raw = series
      .filter(col(indexCol).isNotNull && col(valueCol).isNotNull)
      .select(col(indexCol).cast("double").as("__t0"),
        col(valueCol).cast("double").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the route probe: one count over two columns — the only way to
    // BOUND the pair blowup is to measure it (docs don't stop a
    // caller; a require/route does) — and it doubles as the persist
    // materialization, so every later consumer reads the cache
    val nPoints = raw.count()
    // center the index: the slope is shift-invariant, and sums of
    // t^2 at epoch magnitudes leave double precision (n * st2 for a
    // year of hours is ~1e17 > 2^53) — centered they never do
    val tmin = raw.agg(min(col("__t0")).as("__tmin"))
    val s = raw.crossJoin(broadcast(tmin))
      .select((col("__t0") - col("__tmin")).as("__t"), col("__v"))
    val slopes =
      if (nPoints <= maxExactPoints) {
        val b = s.select(col("__t").as("__tb"), col("__v").as("__vb"))
        s.crossJoin(b)
          .filter(col("__t") < col("__tb"))
          .select(((col("__vb") - col("__v")) /
            (col("__tb") - col("__t"))).as("__slope"))
      } else {
        val nBuckets = ((nPoints + pairBucketSize - 1) / pairBucketSize)
          .max(1L)
        val withBucket = s.select(col("__t"), col("__v"),
          pmod(xxhash64(col("__t")), lit(nBuckets)).as("__b"))
        val b = withBucket.select(col("__b"), col("__t").as("__tb"),
          col("__v").as("__vb"))
        withBucket.join(b, Seq("__b"))
          .filter(col("__t") < col("__tb"))
          .select(((col("__vb") - col("__v")) /
            (col("__tb") - col("__t"))).as("__slope"))
      }
    val med = FeatureScale.exactQuantiles(slopes, "__slope", Seq(0.5))
      .select(col("n").as("n_pairs"),
        col("value").cast("double").as("theil_sen"))
    val ols = s.agg(
      count(lit(1)).as("n"), sum(col("__t")).as("__st"),
      sum(col("__v")).as("__sv"),
      sum(col("__t") * col("__v")).as("__stv"),
      sum(col("__t") * col("__t")).as("__st2"))
      .select(col("n"),
        when(col("n") * col("__st2") - col("__st") * col("__st") > 0,
          (col("n") * col("__stv") - col("__st") * col("__sv")) /
            (col("n") * col("__st2") - col("__st") * col("__st")))
          .as("ols"))
    val out = ols.crossJoin(broadcast(med))
      .select(col("n"), col("n_pairs"), col("theil_sen"), col("ols"))
    (out, () => { raw.unpersist(); () })
  }

  /** EXACT single change-point detection: the split of an indexed
    * series into two segments that minimizes total within-segment
    * squared error — "WHEN did the level shift", where [[acf]] asks
    * "does it cycle" and CUSUM flags "that it drifted". Returns one
    * row: n, split_t (last index of the left segment), n_left,
    * mean_left, mean_right, sse_global, sse_split, reduction
    * (sse_global - sse_split; ~0 means no shift worth believing).
    * Ties on reduction break to the smallest split_t. NULL
    * index/value rows drop.
    *
    * Scale shape: every candidate split is scored from ONE
    * [[FeatureScale.runningTotalsMultiReleasable]] pass (cumulative
    * count / sum / sum-of-squares in index order) — left and right
    * segment SSEs are arithmetic on the cumulatives, so the scan of
    * all n-1 splits is a projection, the argmax is a 1-row
    * min_by aggregate, and nothing ever sorts through a single
    * partition. (The textbook per-split recomputation is O(n^2); this
    * is the standard prefix-sum O(n) — distributed.) The persisted
    * sorted layout lives until the session drops it; long-lived
    * sessions should use [[changePointReleasable]].
    */
  def changePoint(
      series: DataFrame,
      indexCol: String,
      valueCol: String): DataFrame =
    changePointReleasable(series, indexCol, valueCol)._1

  /** [[changePoint]] plus a release() thunk for the persisted
    * prefix-sum layout.
    */
  def changePointReleasable(
      series: DataFrame,
      indexCol: String,
      valueCol: String): (DataFrame, () => Unit) = {
    val s = series
      .filter(col(indexCol).isNotNull && col(valueCol).isNotNull)
      .select(col(indexCol).cast("long").as("__t"),
        col(valueCol).cast("double").as("__v"))
    val (cum, release) = FeatureScale.runningTotalsMultiReleasable(
      s, Seq(col("__t")),
      Seq("c" -> lit(1L), "v" -> col("__v"),
        "v2" -> (col("__v") * col("__v"))))
    val k = col("__cum_c").cast("double")
    val n = col("__n_c").cast("double")
    val sseL = col("__cum_v2") - col("__cum_v") * col("__cum_v") / k
    val sseR = (col("__n_v2") - col("__cum_v2")) -
      (col("__n_v") - col("__cum_v")) * (col("__n_v") - col("__cum_v")) /
        (n - k)
    val scored = cum
      .filter(col("__cum_c") < col("__n_c"))
      .select(col("__t"), col("__cum_c"), col("__cum_v"), col("__n_c"),
        col("__n_v"), col("__n_v2"), (sseL + sseR).as("__sse"))
    val out = scored
      .agg(min_by(
        struct(col("__t"), col("__cum_c"), col("__cum_v"),
          col("__n_c"), col("__n_v"), col("__n_v2"), col("__sse")),
        struct(col("__sse"), col("__t"))).as("b"))
      .select(col("b.__n_c").as("n"), col("b.__t").as("split_t"),
        col("b.__cum_c").as("n_left"),
        (col("b.__cum_v") / col("b.__cum_c")).as("mean_left"),
        ((col("b.__n_v") - col("b.__cum_v")) /
          (col("b.__n_c") - col("b.__cum_c"))).as("mean_right"),
        (col("b.__n_v2") - col("b.__n_v") * col("b.__n_v") /
          col("b.__n_c")).as("sse_global"),
        col("b.__sse").as("sse_split"))
      .withColumn("reduction", col("sse_global") - col("sse_split"))
    (out, release)
  }

  /** Seasonality-aware anomaly flags: [[decompose]] the series, then
    * flag every index whose residual sits more than `zThreshold`
    * sample standard deviations from the mean residual — the alert
    * rule that does NOT page on midnight lulls or Monday ramps (a raw
    * threshold on `v` fires on the daily shape; one on the residual
    * fires on departures FROM it). Edge indices with an incomplete
    * trend window carry no residual and cannot flag. Returns the
    * flagged rows only: t, v, trend, seasonal, residual, z.
    *
    * Scale shape: [[decomposeReleasable]]'s plan plus one 1-row
    * residual-moment aggregate broadcast back; the flag is a filter.
    * The persisted decomposition lives until the session drops it
    * (the decompose convenience contract).
    */
  def seasonalAnomalies(
      series: DataFrame,
      indexCol: String,
      valueCol: String,
      period: Int,
      trendWindow: Int,
      zThreshold: Double = 3.0): DataFrame = {
    require(zThreshold > 0, s"zThreshold must be > 0, got $zThreshold")
    val (dec, release) = decomposeReleasable(series, indexCol,
      valueCol, period, trendWindow)
    val _ = release
    val stats = dec.agg(avg(col("residual")).as("__mr"),
      stddev_samp(col("residual")).as("__sr"))
    dec.crossJoin(broadcast(stats))
      .filter(col("residual").isNotNull && col("__sr") > 0)
      .withColumn("z", (col("residual") - col("__mr")) / col("__sr"))
      .filter(abs(col("z")) > zThreshold)
      .select(col("t"), col("v"), col("trend"), col("seasonal"),
        col("residual"), col("z"))
  }

  /** Per-key inter-arrival statistics: number of gaps, mean/min/max
    * gap (seconds), sample std-dev, and the coefficient of variation —
    * the burstiness profile of an event stream (CV ~ 1 is Poisson,
    * >> 1 is bursty, << 1 is periodic). Keys with < 2 events emit
    * n_gaps = 0 and NULL stats.
    *
    * Scale shape: the lag window and the aggregate share ONE hash
    * exchange on the key (same partitioning); gaps never materialize
    * beyond the window projection.
    */
  def interArrivalStats(
      df: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val t = EventTime.micros(df, tsCol)
    val w = Window.partitionBy(col("key")).orderBy(col("__t"))
    df.select(col(keyCol).as("key"), t.as("__t"))
      .withColumn("__gap",
        (col("__t") - lag(col("__t"), 1).over(w)).cast("double") / 1e6)
      .groupBy(col("key"))
      .agg(
        count(col("__gap")).as("n_gaps"),
        avg(col("__gap")).as("mean_gap_s"),
        min(col("__gap")).as("min_gap_s"),
        max(col("__gap")).as("max_gap_s"),
        stddev_samp(col("__gap")).as("std_gap_s"))
      .withColumn("cv",
        when(col("mean_gap_s") > 0,
          col("std_gap_s") / col("mean_gap_s")))
  }

  /** Activity concentration across keys: the Gini coefficient and
    * top-decile share of per-key event WEIGHT (row count, or a value
    * column's sum) — "how unequal is the traffic", the screen that
    * decides whether per-key capping / skew handling is needed before
    * a pipeline run.
    *
    * gini = 2 * sum(i * x_(i)) / (n * sum x) - (n + 1) / n over
    * ascending-sorted per-key weights (rank ties broken by key for
    * determinism). Scale shape: events collapse to per-key totals
    * first (one exchange, map-side combined); the global rank over the
    * KEY-cardinality table then comes from the
    * [[FeatureScale.runningTotalsReleasable]] distributed prefix sum —
    * a billion-key frame range-partitions instead of funneling through
    * the single-partition sort a naive `row_number().over(orderBy)`
    * would plan. Output one row: n_keys, total, gini,
    * top_decile_share. The persisted key layout stays pinned until the
    * session drops it; use [[concentrationReleasable]] to reclaim.
    */
  def concentration(
      df: DataFrame,
      keyCol: String,
      valueCol: Option[String] = None): DataFrame =
    concentrationReleasable(df, keyCol, valueCol)._1

  /** [[concentration]] plus a release() thunk for the persisted
    * ranked-key layout.
    */
  def concentrationReleasable(
      df: DataFrame,
      keyCol: String,
      valueCol: Option[String] = None): (DataFrame, () => Unit) = {
    val weight = valueCol
      .map(c => sum(coalesce(col(c).cast("double"), lit(0.0))))
      .getOrElse(count(lit(1)).cast("double"))
    val perKey = df.groupBy(col(keyCol).as("key"))
      .agg(weight.as("x"))
    // __cum IS the global 1-based rank (weight 1 over a total order)
    val (ranked, release) = FeatureScale.runningTotalsReleasable(
      perKey, Seq(col("x").asc, col("key").asc), lit(1L))
    val out = ranked.agg(
        count(lit(1)).as("n_keys"),
        sum(col("x")).as("total"),
        sum(col("__cum") * col("x")).as("__ix"),
        max(col("__n")).as("__nn"),
        sum(when(col("__cum") > col("__n") - floor(col("__n") / 10),
          col("x"))).as("__topx"))
      .select(col("n_keys"), col("total"),
        (lit(2.0) * col("__ix") / (col("__nn") * col("total")) -
          (col("__nn") + 1).cast("double") / col("__nn")).as("gini"),
        (coalesce(col("__topx"), lit(0.0)) / col("total"))
          .as("top_decile_share"))
    (out, release)
  }

  /** First/last-touch conversion attribution: for every conversion
    * event, the key's FIRST and LAST touch event (of the given touch
    * types) in the preceding `lookbackSeconds` (strictly before the
    * conversion). The standard marketing/causal-credit assignment over
    * an event log.
    *
    * Scale shape: one hash exchange on the key + one sort carries BOTH
    * window passes (first and last touch read the same ordered
    * partition); no self-join of the event table against itself.
    * Conversions with no in-window touch report NULL touch columns
    * (unattributed). Ties at the same micro use the tie column
    * (ascending = first, descending = last) so replay is
    * deterministic. Output: one row per conversion — key, conv_t,
    * conv_tie, first_touch_type, first_touch_t, last_touch_type,
    * last_touch_t.
    */
  def touchAttribution(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String,
      touchTypes: Seq[String],
      conversionType: String,
      lookbackSeconds: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    require(!touchTypes.contains(conversionType),
      "conversionType must not also be a touch type")
    require(lookbackSeconds > 0,
      s"lookbackSeconds must be > 0, got $lookbackSeconds")
    val touchSet = array(touchTypes.map(lit): _*)
    val base = df.select(col(keyCol).as("key"),
      EventTime.micros(df, tsCol).as("__t"),
      col(typeCol).as("__ty"), col(tieCol).cast("long").as("__tie"))
      .withColumn("__is_touch",
        array_contains(touchSet, col("__ty")))
    // the lookback IS the window frame: [conv_t - horizon, conv_t - 1]
    // in RANGE micros — in-window semantics exactly, and a touch AT
    // the conversion micro never self-attributes. RANGE frames are
    // value-determined, so replay order can't change the answer; the
    // (t, tie) pair breaks min_by/max_by ties among equal-micro
    // touches deterministically.
    val horizon = lookbackSeconds * 1000000L
    val ord = Window.partitionBy(col("key")).orderBy(col("__t"))
      .rangeBetween(-horizon, -1L)
    val touchT = when(col("__is_touch"), col("__t"))
    val touchKey = when(col("__is_touch"),
      struct(col("__t"), col("__tie")))
    val touchTy = when(col("__is_touch"), col("__ty"))
    val tagged = base
      .withColumn("__first_t", min(touchT).over(ord))
      .withColumn("__first_ty", min_by(touchTy, touchKey).over(ord))
      .withColumn("__last_t", max(touchT).over(ord))
      .withColumn("__last_ty", max_by(touchTy, touchKey).over(ord))
    tagged.filter(col("__ty") === conversionType)
      .select(col("key"), col("__t").as("conv_t"),
        col("__tie").as("conv_tie"),
        col("__first_ty").as("first_touch_type"),
        col("__first_t").as("first_touch_t"),
        col("__last_ty").as("last_touch_type"),
        col("__last_t").as("last_touch_t"))
  }

  /** Time-to-event extraction for survival analysis: per key, the
    * duration (micros) from the FIRST event of any kind to the first
    * `targetType` event — or, for keys that never reach the target,
    * to their LAST observed event with `observed = 0` (right
    * censoring, the subject left the study still event-free). One
    * aggregate over the events (conditional min/max — no window pass);
    * keys whose only event is their first observation get duration 0.
    * Feed the result to [[kaplanMeier]].
    */
  def timeToEvent(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      targetType: String): DataFrame = {
    val t = EventTime.micros(df, tsCol)
    df.groupBy(col(keyCol).as("key"))
      .agg(min(t).as("__t0"),
        min(when(col(typeCol) === targetType, t)).as("__tt"),
        max(t).as("__tmax"))
      .select(col("key"),
        when(col("__tt").isNotNull, col("__tt") - col("__t0"))
          .otherwise(col("__tmax") - col("__t0")).as("duration"),
        when(col("__tt").isNotNull, 1).otherwise(0).as("observed"))
  }

  /** Kaplan–Meier survival curve over (duration, observed) rows —
    * time-to-conversion / churn with RIGHT CENSORING handled the
    * standard way (Kaplan & Meier 1958): at each distinct event time
    * t_i with d_i observed events out of n_i still at risk,
    * S(t) = prod_{t_i <= t} (1 - d_i / n_i); censored rows leave the
    * risk set without an event. The product is computed in CLOSED form
    * as exp(cumsum(ln(1 - d/n))) over one window pass, so the whole
    * curve is ONE aggregate to distinct times + one sort — no driver
    * loop, no recursion, and every term is SQL-expressible for oracle
    * checks. Durations collapse to distinct-time rows first, so the
    * window runs over |distinct times|, never |subjects| — at
    * microsecond resolution distinct times approach subject count, so
    * bucket durations first (floor to seconds / hours) when subject
    * cardinality is large. Output (one row per distinct OBSERVED event
    * time, ascending): t, n_risk, n_events, n_censored (censorings AT
    * t, leaving after it), survival, hazard (d/n at t), cum_hazard
    * (the Nelson–Aalen estimator — ≈ −ln(survival), exact when
    * hazards are small), survival_lo / survival_hi (the 95% linear
    * Greenwood band, clipped to [0, 1]).
    */
  def kaplanMeier(
      df: DataFrame,
      durationCol: String,
      observedCol: String): DataFrame =
    kaplanMeierImpl(df, durationCol, observedCol, None)

  /** One [[kaplanMeier]] curve PER GROUP — cohort survival side by
    * side. Structurally better than K separate calls at scale: the
    * ordering windows partition on the group, so no single-partition
    * global sort exists at all. Output: group, then the
    * [[kaplanMeier]] columns.
    */
  def kaplanMeierGrouped(
      df: DataFrame,
      durationCol: String,
      observedCol: String,
      groupCol: String): DataFrame =
    kaplanMeierImpl(df.filter(col(groupCol).isNotNull), durationCol,
      observedCol, Some(groupCol))

  private def kaplanMeierImpl(
      df: DataFrame,
      durationCol: String,
      observedCol: String,
      groupCol: Option[String]): DataFrame = {
    val gcols = groupCol.toSeq.map(c => col(c).cast("string").as("group"))
    val gkeys = groupCol.toSeq.map(_ => col("group"))
    val grouped = df
      .filter(col(durationCol).isNotNull && col(durationCol) >= 0)
      .groupBy(gcols :+ col(durationCol).cast("long").as("t"): _*)
      .agg(sum(when(col(observedCol) === 1, 1L).otherwise(0L))
          .as("n_events"),
        sum(when(col(observedCol) === 1, 0L).otherwise(1L))
          .as("n_censored"),
        count(lit(1)).as("__n_at_t"))
    def ordered = Window.partitionBy(gkeys: _*).orderBy(col("t"))
    val w = ordered.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wPrev = ordered.rowsBetween(Window.unboundedPreceding, -1)
    grouped
      .withColumn("__total", sum(col("__n_at_t")).over(
        ordered.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("n_risk",
        col("__total") - coalesce(sum(col("__n_at_t")).over(wPrev), lit(0L)))
      // a time where EVERYONE at risk has the event makes its factor 0
      // — Spark's log(0) is NULL, not -inf, so zero factors are
      // tracked explicitly and survival pins to 0 from there on
      .withColumn("__lnterm",
        when(col("n_events") < col("n_risk"),
          log(lit(1.0) -
            col("n_events").cast("double") / col("n_risk")))
          .otherwise(lit(0.0)))
      .withColumn("__zeros",
        sum(when(col("n_events") === col("n_risk"), 1L).otherwise(0L))
          .over(w))
      .withColumn("survival",
        when(col("__zeros") > 0, lit(0.0))
          .otherwise(exp(sum(col("__lnterm")).over(w))))
      // companions off the same window pass: the per-time hazard
      // d/n, the Nelson-Aalen cumulative hazard sum(d/n), and the
      // 95% Greenwood band se = S * sqrt(sum d/(n(n-d))) (the d = n
      // term is skipped — survival is pinned 0 there anyway)
      .withColumn("hazard",
        col("n_events").cast("double") / col("n_risk"))
      .withColumn("cum_hazard", sum(col("hazard")).over(w))
      .withColumn("__gw", sum(
        when(col("n_events") < col("n_risk"),
          col("n_events").cast("double") /
            (col("n_risk").cast("double") *
              (col("n_risk") - col("n_events")))).otherwise(lit(0.0)))
        .over(w))
      .withColumn("__se", col("survival") * sqrt(col("__gw")))
      .withColumn("survival_lo",
        greatest(col("survival") - lit(1.96) * col("__se"), lit(0.0)))
      .withColumn("survival_hi",
        least(col("survival") + lit(1.96) * col("__se"), lit(1.0)))
      .filter(col("n_events") > 0)
      .select(gkeys ++ Seq(col("t"), col("n_risk"), col("n_events"),
        col("n_censored"), col("survival"), col("hazard"),
        col("cum_hazard"), col("survival_lo"), col("survival_hi")): _*)
  }

  /** RFM segmentation (recency / frequency / monetary) per key — the
    * classic behavioral customer-value decomposition: recency =
    * seconds from the key's LAST event to the corpus-wide latest event
    * (anchoring on data, not wall clock, keeps replays exact),
    * frequency = event count, monetary = summed `valueCol`. Each
    * dimension then scores 1..nTiles by ntile with the BEST tile
    * mapped to the highest score (most recent / most frequent /
    * highest spend = nTiles), ties broken by key so both engines cut
    * identically; `rfm` concatenates the three digits. One aggregate
    * to per-key rows + three distributed rank passes over |keys|
    * (never |events|): each ntile comes from the
    * [[FeatureScale.runningTotalsReleasable]] prefix sum — global row
    * number + total, then SQL ntile's closed form — so a billion-key
    * frame range-partitions three times instead of serializing through
    * three single-partition `ntile().over(Window.orderBy)` sorts.
    * Output: key, recency_s, frequency, monetary, r_score, f_score,
    * m_score, rfm.
    *
    * The per-key aggregate and the three rank layouts stay persisted
    * until the session drops them; use [[rfmReleasable]] to reclaim
    * after materializing.
    */
  def rfm(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      nTiles: Int = 5): DataFrame =
    rfmReleasable(df, keyCol, tsCol, valueCol, nTiles)._1

  /** [[rfm]] plus a release() thunk for the cached per-key aggregate:
    * the corpus-max reference time derives from that (keys-sized)
    * frame, so without the cache the events would aggregate twice.
    */
  def rfmReleasable(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      nTiles: Int = 5): (DataFrame, () => Unit) = {
    require(nTiles >= 2, s"nTiles must be >= 2, got $nTiles")
    val t = EventTime.micros(df, tsCol)
    val agg = df.groupBy(col(keyCol).as("key"))
      .agg(max(t).as("__last"), count(lit(1)).as("frequency"),
        sum(col(valueCol).cast("double")).as("monetary"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ref = agg.agg(max(col("__last")).as("__ref"))
    val base = agg.crossJoin(broadcast(ref))
      .select(col("key"),
        expr("(__ref - __last) div 1000000").as("recency_s"),
        col("frequency"), col("monetary"))

    // SQL ntile's closed form from the global row number r over total
    // N: bucketSize = N div n, rem = N mod n, the first rem buckets
    // take one extra row — r <= rem*(bucketSize+1) lands in bucket
    // ceil(r/(bucketSize+1)), the rest in rem + ceil((r-cut)/
    // bucketSize). Integer ceil via (a + b - 1) div b; when
    // bucketSize = 0 (fewer keys than tiles) cut = N and the first
    // branch degenerates to bucket = r, exactly Spark's ntile.
    // NtileClosedFormSpec pins equality against ntile() itself.
    val tileExpr = expr(
      s"""CASE WHEN __cum <= (__n % $nTiles) * ((__n div $nTiles) + 1)
         |  THEN (__cum + (__n div $nTiles)) div ((__n div $nTiles) + 1)
         |  ELSE (__n % $nTiles) +
         |    (__cum - (__n % $nTiles) * ((__n div $nTiles) + 1)
         |      + (__n div $nTiles) - 1) div (__n div $nTiles)
         |END""".stripMargin)
    def score(in: DataFrame, order: Seq[Column], outCol: String)
        : (DataFrame, () => Unit) = {
      val (cum, release) = FeatureScale.runningTotalsReleasable(
        in, order, lit(1L))
      (cum.withColumn(outCol,
          (lit(nTiles + 1) - tileExpr).cast("long"))
        .drop("__cum", "__n"), release)
    }
    // monetary ranks on the 6-decimal rounding: a float sum's last
    // ulps depend on reduction order, and two keys flipping across
    // engines would flip their ntiles — rounding first makes the cut
    // reduction-order-independent
    val (r1, rel1) = score(base,
      Seq(col("recency_s").asc, col("key").asc), "r_score")
    val (r2, rel2) = score(r1,
      Seq(col("frequency").desc, col("key").asc), "f_score")
    val (r3, rel3) = score(r2,
      Seq(round(col("monetary"), 6).desc, col("key").asc), "m_score")
    val out = r3.withColumn("rfm",
      col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
    (out, () => {
      rel1(); rel2(); rel3()
      agg.unpersist(blocking = false); ()
    })
  }

  /** Two-sample log-rank test (Mantel 1966): do two cohorts share a
    * survival curve? At every distinct event time, group 1's observed
    * events compare against the hypergeometric expectation under the
    * null (events distribute over groups proportional to their risk
    * sets); chi2 = (Σ(O−E))² / ΣV with the standard variance term,
    * gate at 3.84 for α = 0.05 (df 1). Same scale shape as
    * [[kaplanMeier]]: one aggregate to (time, group) cells, one
    * bounded window pass over distinct times — no per-subject shuffle
    * beyond the first aggregate, no driver loop; fully SQL-exact.
    * With exactly two group values this is the classic two-sample
    * test; with more, the lexicographic-min group tests against the
    * REST pooled (one-vs-rest). Rows with a NULL group drop. Output
    * (one row): group_a, group_b (the max group value — "rest" label
    * under pooling), n_a, n_b, observed_a, expected_a, chi2.
    *
    * The (time, group) cell cache stays persisted until the session
    * drops it; use [[logRankReleasable]] to reclaim after
    * materializing.
    */
  def logRank(
      df: DataFrame,
      durationCol: String,
      observedCol: String,
      groupCol: String): DataFrame =
    logRankReleasable(df, durationCol, observedCol, groupCol)._1

  /** [[logRank]] plus a release() thunk for the cached (time, group)
    * cell table — group labels, risk sets, AND cohort sizes all derive
    * from it, so without the cache the subject rows would aggregate
    * three times.
    */
  def logRankReleasable(
      df: DataFrame,
      durationCol: String,
      observedCol: String,
      groupCol: String): (DataFrame, () => Unit) = {
    val base = df.filter(col(durationCol).isNotNull &&
      col(durationCol) >= 0 && col(groupCol).isNotNull)
    // per (time, group): events and subjects arriving at t
    val cells = base
      .groupBy(col(durationCol).cast("long").as("t"),
        col(groupCol).cast("string").as("g"))
      .agg(sum(when(col(observedCol) === 1, 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pivot the (at most two) groups wide with conditional sums keyed
    // on the lexicographic min/max group value
    val ga = cells.agg(min(col("g")).as("ga"), max(col("g")).as("gb"))
    val wide = cells.crossJoin(broadcast(ga))
      .groupBy(col("t"), col("ga"), col("gb"))
      .agg(sum(when(col("g") === col("ga"), col("d")).otherwise(0L))
          .as("d1"),
        sum(when(col("g") === col("ga"), col("m")).otherwise(0L))
          .as("m1"),
        sum(when(col("g") =!= col("ga"), col("d")).otherwise(0L))
          .as("d2"),
        sum(when(col("g") =!= col("ga"), col("m")).otherwise(0L))
          .as("m2"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("t")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val risks = wide
      .withColumn("n1",
        sum(col("m1")).over(wAll) - coalesce(sum(col("m1")).over(w),
          lit(0L)))
      .withColumn("n2",
        sum(col("m2")).over(wAll) - coalesce(sum(col("m2")).over(w),
          lit(0L)))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("d", col("d1") + col("d2"))
      .filter(col("d") > 0)
      .withColumn("e1",
        col("d").cast("double") * col("n1") / col("n"))
      .withColumn("v",
        when(col("n") > 1,
          col("d").cast("double") * (col("n1").cast("double") / col("n")) *
            (col("n2").cast("double") / col("n")) *
            (col("n") - col("d")).cast("double") / (col("n") - 1))
          .otherwise(lit(0.0)))
    // cohort sizes derive from the cached cell table (subjects count
    // once, at their duration time) — no second pass over subjects
    val sizes = cells
      .crossJoin(broadcast(cells.agg(min(col("g")).as("__mg"))))
      .agg(sum(when(col("g") === col("__mg"), col("m"))
          .otherwise(0L)).as("__na"),
        sum(col("m")).as("__tot"))
    val out = risks
      .groupBy(col("ga"), col("gb"))
      .agg(sum(col("d1")).as("observed_a"),
        sum(col("e1")).as("expected_a"),
        sum(col("v")).as("__v"))
      .crossJoin(broadcast(sizes))
      .select(col("ga").as("group_a"), col("gb").as("group_b"),
        col("__na").as("n_a"), (col("__tot") - col("__na")).as("n_b"),
        col("observed_a"),
        col("expected_a"),
        when(col("__v") > 0,
          (col("observed_a") - col("expected_a")) *
            (col("observed_a") - col("expected_a")) / col("__v"))
          .otherwise(lit(0.0)).as("chi2"))
    (out, () => { cells.unpersist(blocking = false); () })
  }
}
