package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
