package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{kll_agg, kll_quantile}

/** IQR (Tukey-fence) outlier statistics per group — the data-quality
  * screen a training pipeline runs before ingesting a numeric feature.
  *
  * Two-phase plan sized for 100 TB: phase 1 computes per-group quartiles
  * from the engine's own KLL sketch aggregate — constant state per group
  * (k=256 compactor buffers) regardless of row count, so a
  * high-cardinality double column cannot OOM an executor the way Spark's
  * exact `percentile` (which buffers every distinct value per group)
  * would. Below sketch capacity the quartiles are exact (rank-select,
  * inclusive ranks); above it they carry KLL's ~1.7% rank-error bound —
  * amply tight for a 1.5×IQR fence. Phase 2 re-scans the input and counts
  * fence violations with the quartile table BROADCAST — the corpus itself
  * never shuffles on anything but the group key, and both phases are
  * map-side-combinable aggregates.
  */
object Outliers {

  /** Per-group (q1, q3, lo, hi, n_outliers, n): lo/hi are the Tukey
    * fences q1 - factor*IQR / q3 + factor*IQR; quartiles are KLL
    * rank-select quantiles (smallest value whose inclusive rank ≥ p),
    * computed on the sketch's float domain and widened back to double.
    */
  def iqrStats(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      factor: Double = 1.5): DataFrame = {
    val keys = keyCols.map(col)
    val quartiles = df.groupBy(keys: _*)
      .agg(kll_agg(col(valueCol)).as("__sk"))
      .select(keys ++ Seq(
        kll_quantile(col("__sk"), lit(0.25)).cast("double").as("q1"),
        kll_quantile(col("__sk"), lit(0.75)).cast("double").as("q3")): _*)
      .withColumn("lo", col("q1") - lit(factor) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(factor) * (col("q3") - col("q1")))
    // null-safe key equality: groupBy keeps a NULL-key group, and a plain
    // equi-join would silently drop its rows — the exact rows a data-
    // quality screen must not lose
    val q = quartiles.select(
      keyCols.map(c => col(c).as(s"__k_$c")) ++
        Seq(col("q1"), col("q3"), col("lo"), col("hi")): _*)
    val cond = keyCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.join(broadcast(q), cond)
      .groupBy(keys: _*)
      .agg(first(col("q1")).as("q1"), first(col("q3")).as("q3"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        sum(when(col(valueCol) < col("lo") || col(valueCol) > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n"))
  }
}
