package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{kll_agg, kll_quantile}

/** Feature scaling / robust-clipping transforms for training-data
  * preparation: statistics reduce in ONE map-side-combined aggregate
  * (global or per-group), ride back to the rows through a broadcast
  * join, and the transform itself is a pure projection — the corpus
  * never shuffles, at any scale.
  *
  * The reference profiles the statistics these transforms consume
  * (mean/stddev/min/max/quantiles per column — NumberTracker,
  * core/statistics/NumberTracker.java:24); applying them back to the
  * data is the training-pipeline half the reference leaves to its host.
  */
object FeatureScale {

  private def statsJoin(
      df: DataFrame,
      keys: Seq[String],
      stats: DataFrame): DataFrame =
    if (keys.isEmpty) df.crossJoin(broadcast(stats))
    else {
      // Null-safe: a NULL group key forms a real stratum in the stats
      // aggregate, so the join back must match it (<=>) — a plain
      // equi-join would silently drop every NULL-key row from the
      // scaled output.
      val aliased = stats.select(stats.columns.toSeq.map { c =>
        if (keys.contains(c)) col(c).as(s"__key_$c") else col(c)
      }: _*)
      val cond = keys.map(k => col(k) <=> col(s"__key_$k")).reduce(_ && _)
      df.join(broadcast(aliased), cond)
    }

  private def grouped(df: DataFrame, keys: Seq[String]) =
    if (keys.isEmpty) df.groupBy() else df.groupBy(keys.map(col): _*)

  /** Z-score standardization of `cols` (optionally per `keys` group):
    * x -> (x - mean) / stddev_samp, with constant columns (stddev 0 or
    * null, e.g. single-row groups) mapping to 0.0 rather than NaN.
    * Scaled columns REPLACE the originals; everything else passes
    * through.
    */
  def zscore(
      df: DataFrame,
      cols: Seq[String],
      keys: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty, "zscore needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      avg(col(c)).as(s"__mu_$c"), stddev_samp(col(c)).as(s"__sd_$c")))
    val stats = grouped(df, keys).agg(aggs.head, aggs.tail: _*)
    val out = df.columns.toSeq.map { c =>
      if (cols.contains(c))
        when(col(s"__sd_$c").isNotNull && col(s"__sd_$c") > 0,
          (col(c) - col(s"__mu_$c")) / col(s"__sd_$c"))
          .otherwise(lit(0.0)).as(c)
      else col(c)
    }
    statsJoin(df, keys, stats).select(out: _*)
  }

  /** Min-max scaling of `cols` to [0, 1] (optionally per group):
    * x -> (x - min) / (max - min); constant columns map to 0.0. Exact
    * and engine-reproducible (min/max carry no accumulation order).
    */
  def minMax(
      df: DataFrame,
      cols: Seq[String],
      keys: Seq[String] = Nil): DataFrame = {
    require(cols.nonEmpty, "minMax needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"__lo_$c"), max(col(c)).as(s"__hi_$c")))
    val stats = grouped(df, keys).agg(aggs.head, aggs.tail: _*)
    val out = df.columns.toSeq.map { c =>
      if (cols.contains(c))
        when(col(s"__hi_$c") > col(s"__lo_$c"),
          (col(c) - col(s"__lo_$c")) / (col(s"__hi_$c") - col(s"__lo_$c")))
          .otherwise(lit(0.0)).as(c)
      else col(c)
    }
    statsJoin(df, keys, stats).select(out: _*)
  }

  /** Robust scaling: x -> (x - median) / (q75 - q25), fences from ONE
    * KLL aggregate (optionally per group) — outlier-insensitive where
    * [[zscore]]'s mean/stddev are not. Degenerate IQR (constant-ish
    * column) maps to 0.0. Same sketch rank semantics as [[winsorize]].
    */
  def robustScale(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String] = Nil): DataFrame = {
    val stats = grouped(df, keys)
      .agg(kll_agg(col(valueCol)).as("__sk"))
      .select((keys.map(col) :+
        kll_quantile(col("__sk"), lit(0.25)).as("__q1") :+
        kll_quantile(col("__sk"), lit(0.5)).as("__q2") :+
        kll_quantile(col("__sk"), lit(0.75)).as("__q3")): _*)
    val out = df.columns.toSeq.map { c =>
      if (c == valueCol)
        when(col("__q3") > col("__q1"),
          (col(c) - col("__q2")) / (col("__q3") - col("__q1")))
          .otherwise(lit(0.0)).as(c)
      else col(c)
    }
    statsJoin(df, keys, stats).select(out: _*)
  }

  /** Winsorization: clip `valueCol` to its [loQ, hiQ] KLL-quantile
    * fences (optionally per group) — the robust-outlier companion to
    * [[Outliers.iqrStats]]. Sketch-driven: the fence pass is ONE
    * kll_agg (no sort, no exact percentile shuffle), exact below sketch
    * capacity and rank-accurate above it; the clip itself is a
    * projection. Fences use the sketch's rank semantics: the smallest
    * value whose rank >= ceil(q * n).
    */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      loQ: Double,
      hiQ: Double,
      keys: Seq[String] = Nil): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ <= hiQ,
      s"need 0 <= loQ <= hiQ <= 1, got $loQ / $hiQ")
    val stats = grouped(df, keys)
      .agg(kll_agg(col(valueCol)).as("__sk"))
      .select((keys.map(col) :+
        kll_quantile(col("__sk"), lit(loQ)).as("__lo") :+
        kll_quantile(col("__sk"), lit(hiQ)).as("__hi")): _*)
    val out = df.columns.toSeq.map { c =>
      if (c == valueCol)
        least(greatest(col(c), col("__lo")), col("__hi")).as(c)
      else col(c)
    }
    statsJoin(df, keys, stats).select(out: _*)
  }

  /** EXACT empirical-CDF table for `valueCol` (optionally per `keys`
    * group): one row per distinct (group, value) with
    * `outCol = #(rows <= value within the group) / #(group rows)` —
    * SQL `cume_dist()` semantics, but computed scale-safe. NULL values
    * are excluded (they carry no rank).
    *
    * Scale shape — the [[Packing]] distributed prefix sum, applied to
    * VALUE COUNTS instead of token counts: (1) ONE map-side-combined
    * `groupBy(value).count` collapses the corpus to its distinct
    * values; (2) the counts frame range-repartitions on (keys, value)
    * and sorts within partitions; (3) per-(partition, group) subtotals
    * cumulate into exclusive offsets (a frame of #partitions × #groups
    * boundary rows, windowed BY GROUP in parallel — never a global
    * single-task window); (4) the in-partition running sum finishes the
    * inclusive count. The offsets join deliberately reuses the
    * hashpartitioning the running window needs anyway (see
    * [[Packing.packSequencesReleasable]] for why it must not
    * broadcast). A naive `cume_dist() over (order by value)` collapses
    * the whole corpus into ONE task; this plan's only corpus-scale
    * exchange is the initial counts aggregate.
    */
  def percentileRanks(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String] = Nil,
      outCol: String = "pct_rank"): DataFrame = {
    val (out, release) = percentileRanksReleasable(df, valueCol, keys, outCol)
    // the persisted counts layout stays pinned until the session drops
    // it; callers that materialize exactly once should prefer the
    // releasable variant
    val _ = release
    out
  }

  /** [[percentileRanks]] plus a release() thunk for the persisted
    * distinct-value layout (same contract as
    * [[Packing.packSequencesReleasable]]: release once materialized).
    */
  def percentileRanksReleasable(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String] = Nil,
      outCol: String = "pct_rank"): (DataFrame, () => Unit) = {
    val keyCols = keys.map(col)
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy((keyCols :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("__c"))
    val sorted = counts
      .repartitionByRange((keyCols :+ col(valueCol)): _*)
      .sortWithinPartitions((keyCols :+ col(valueCol)): _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-(partition, group) subtotals -> exclusive offsets; the window
    // partitions by GROUP (parallel), ordering partitions by id. With
    // no keys this is #partitions rows — driver-scale by construction.
    val offWin =
      (if (keys.isEmpty) Window.partitionBy()
       else Window.partitionBy(keyCols: _*))
        .orderBy(col("__pid"))
        .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted
      .groupBy((col("__pid") +: keyCols): _*)
      .agg(sum(col("__c")).as("__psum"))
      .withColumn("__poffset",
        coalesce(sum(col("__psum")).over(offWin), lit(0L)))
      .drop("__psum")

    val running = Window
      .partitionBy((col("__pid") +: keyCols): _*)
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val totals = counts
      .groupBy(keyCols: _*)
      .agg(sum(col("__c")).as("__n"))

    // null-safe offsets join (a NULL group key is a real stratum, like
    // statsJoin): rename the offsets side, match __pid by = and keys
    // by <=>, reusing the hashpartitioning the running window needs
    val offRenamed = offsets.select(
      (col("__pid").as("__off_pid") +:
        keys.map(k => col(k).as(s"__off_$k")) :+
        col("__poffset")): _*)
    val offCond = keys.foldLeft(col("__pid") === col("__off_pid")) {
      (c, k) => c && (col(k) <=> col(s"__off_$k"))
    }
    val ranked = sorted
      .join(offRenamed, offCond)
      .withColumn("__cum",
        col("__poffset") + sum(col("__c")).over(running))
    val out = statsJoin(ranked, keys, totals)
      .select((keyCols :+ col(valueCol) :+
        (col("__cum").cast("double") / col("__n").cast("double"))
          .as(outCol)): _*)
    (out, () => { sorted.unpersist(); () })
  }

  /** Attach the inclusive running total of `weight` over a GLOBAL
    * `order` — the distributed prefix sum every "rank the whole
    * table" op needs, WITHOUT the single-partition sort a naive
    * `Window.orderBy(...)` plans. `order` must be a TOTAL order
    * (callers append a tie-break column); with `weight = lit(1L)` the
    * running total IS the global 1-based row number.
    *
    * Output = the input columns + `__cum` (inclusive running total of
    * `weight` in `order`) + `__n` (the grand total, on every row).
    * Returns the frame plus a release() thunk for the persisted sorted
    * layout (same contract as [[percentileRanksReleasable]]).
    *
    * Scale shape (the [[Packing.packSequencesReleasable]] prefix sum,
    * factored out): (1) range-repartition + in-partition sort on
    * `order`; (2) per-partition subtotals cumulate into exclusive
    * offsets — a #partitions-row frame whose single-partition window
    * is driver-scale BY CONSTRUCTION (its ordering column is `__pid`,
    * which the board-wide plan canary recognizes as the bounded
    * shape); (3) the offsets join back on `__pid`, reusing the
    * hashpartitioning the in-partition running window needs anyway,
    * and the running sum finishes the inclusive total. The only
    * corpus-scale exchanges are the range partition and the `__pid`
    * hash — both carry the input rows once.
    */
  def runningTotalsReleasable(
      df: DataFrame,
      order: Seq[Column],
      weight: Column): (DataFrame, () => Unit) = {
    val (multi, release) =
      runningTotalsMultiReleasable(df, order, Seq("" -> weight))
    (multi.withColumnRenamed("__cum_", "__cum")
      .withColumnRenamed("__n_", "__n"), release)
  }

  /** [[runningTotalsReleasable]] for SEVERAL weights over ONE shared
    * ordering: each (name, weight) yields `__cum_<name>` (inclusive
    * running total) and `__n_<name>` (grand total) — the sorted layout,
    * the offsets frame, and the in-partition running window are all
    * paid ONCE, where N single-weight calls would range-exchange the
    * input N times. Needed wherever a rank statistic reads two
    * cumulatives at the same row (average precision: cumulative trials
    * AND cumulative positives at each score threshold).
    */
  def runningTotalsMultiReleasable(
      df: DataFrame,
      order: Seq[Column],
      weights: Seq[(String, Column)]): (DataFrame, () => Unit) = {
    require(order.nonEmpty, "runningTotals needs an ordering")
    require(weights.nonEmpty, "runningTotals needs at least one weight")
    // a duplicate name would make the foldLeft withColumn silently
    // overwrite the earlier weight, corrupting every cumulative
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate weight names: ${weights.map(_._1).mkString(", ")}")
    val inCols = df.columns.toSeq
    val sorted = weights
      .foldLeft(df) { case (d, (n, w)) => d.withColumn(s"__w_$n", w) }
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // per-partition subtotals -> exclusive offsets + grand totals; the
    // windows order by __pid over #partitions rows (bounded), so Spark
    // plans them in one WindowExec
    val offWin = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val allWin = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val psums = weights.map { case (n, _) =>
      sum(col(s"__w_$n")).as(s"__psum_$n") }
    val offsets = sorted
      .groupBy(col("__pid"))
      .agg(psums.head, psums.tail: _*)
      .select((col("__pid").as("__off_pid") +: weights.flatMap {
        case (n, _) => Seq(
          coalesce(sum(col(s"__psum_$n")).over(offWin), lit(0L))
            .as(s"__poffset_$n"),
          sum(col(s"__psum_$n")).over(allWin).as(s"__n_$n"))
      }): _*)

    val running = Window.partitionBy(col("__pid"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = weights
      .foldLeft(sorted.join(offsets, col("__pid") === col("__off_pid"))) {
        case (d, (n, _)) => d.withColumn(s"__cum_$n",
          col(s"__poffset_$n") + sum(col(s"__w_$n")).over(running))
      }
      .select((inCols.map(col) ++ weights.flatMap { case (n, _) =>
        Seq(col(s"__cum_$n"), col(s"__n_$n")) }): _*)
    (out, () => { sorted.unpersist(); () })
  }

  /** Attach the exact percentile rank of `valueCol` to every row
    * (optionally per `keys` group): SQL `cume_dist()` as a column, at
    * corpus scale. Rows with a NULL value get a NULL rank. The rank
    * table rides back through a shuffle join on (keys, value) — NOT a
    * broadcast: distinct values of a continuous column are
    * corpus-scale.
    */
  def percentileRank(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String] = Nil,
      outCol: String = "pct_rank"): DataFrame = {
    val ranks = percentileRanks(df, valueCol, keys, outCol)
    df.join(ranks, keys :+ valueCol, "left")
      .select((df.columns.toSeq.map(col) :+ col(outCol)): _*)
  }

  /** EXACT discrete quantiles at corpus scale (optionally per `keys`
    * group): for each q, the element at ascending rank
    * `max(1, ceil(q * n))` — SQL `quantile_disc` semantics, the
    * actually-occurring value (never an interpolation), where
    * `percentile_approx`/KLL answers are off by a rank epsilon. The
    * difference matters when the quantile IS the contract: a conformal
    * prediction threshold, a p99 latency SLO, a "trim the top 0.1%"
    * cut that must reproduce bit-for-bit across runs. NULL values
    * carry no rank. Returns one row per (keys, q): keys..., q, n,
    * value.
    *
    * Scale shape: ONE map-side-combined aggregate collapses the corpus
    * to distinct-value counts. Ungrouped, the global rank comes from
    * the [[runningTotalsReleasable]] distributed prefix sum (never a
    * single-partition sort); grouped, the cumulative window partitions
    * BY GROUP — parallel at any key count. Selection explodes the
    * (small, literal) q list against the counts and takes one min per
    * (group, q). The persisted layout of the ungrouped path lives
    * until session end in this convenience form (the
    * [[percentileRanks]] contract).
    */
  def exactQuantiles(
      df: DataFrame,
      valueCol: String,
      qs: Seq[Double],
      keys: Seq[String] = Nil): DataFrame =
    weightedQuantiles(df, valueCol, lit(1L), qs, keys)

  /** [[exactQuantiles]] with a WEIGHT per row: the element at the
    * smallest value whose cumulative weight reaches `q * totalWeight`
    * (rank = max(1, ceil(q * W)) over integer weights — with weight 1
    * this IS `quantile_disc`). The question a token-budgeted pipeline
    * actually asks: "what sequence-length cut keeps 99% of TOKENS"
    * is a token-weighted quantile of length, not a document-count
    * one. Weights cast to long; rows with NULL/non-positive weight
    * carry no rank.
    */
  def weightedQuantiles(
      df: DataFrame,
      valueCol: String,
      weight: Column,
      qs: Seq[Double],
      keys: Seq[String] = Nil): DataFrame = {
    require(qs.nonEmpty, "exactQuantiles needs at least one q")
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"every q must be in [0, 1], got $qs")
    val keyCols = keys.map(col)
    val w = weight.cast("long")
    val counts = df
      .filter(col(valueCol).isNotNull && w.isNotNull && w > 0)
      .groupBy((keyCols :+ col(valueCol)): _*)
      .agg(sum(w).as("__c"))
    val cum =
      if (keys.isEmpty) {
        val (c, release) = runningTotalsReleasable(
          counts, Seq(col(valueCol)), col("__c"))
        val _ = release
        c
      } else {
        val wRun = Window.partitionBy(keyCols: _*)
          .orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(keyCols: _*)
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)
        counts
          .withColumn("__cum", sum(col("__c")).over(wRun))
          .withColumn("__n", sum(col("__c")).over(wAll))
      }
    // rank_q = max(1, ceil(q * n)) in DOUBLE exactly as the oracle
    // computes it — both engines see the same literal and the same
    // IEEE product, so boundary cases agree by construction
    cum
      .select((keyCols :+ col(valueCol) :+ col("__cum") :+ col("__n") :+
        explode(array(qs.map(lit): _*)).as("q")): _*)
      .filter(col("__cum") >=
        greatest(lit(1L), ceil(col("q") * col("__n"))))
      .groupBy((keyCols :+ col("q")): _*)
      .agg(max(col("__n")).as("n"), min(col(valueCol)).as("value"))
  }
}
