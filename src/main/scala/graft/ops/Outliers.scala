package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IQR (Tukey-fence) outlier statistics per group — the data-quality
  * screen a training pipeline runs before ingesting a numeric feature.
  *
  * Two-phase plan sized for 100 TB: phase 1 computes exact per-group
  * quartiles (one aggregate; group count is small — it is the GROUP BY
  * cardinality, not the row count); phase 2 re-scans the input and counts
  * fence violations with the quartile table BROADCAST — the corpus itself
  * never shuffles on anything but the group key, and both phases are
  * map-side-combinable aggregates.
  */
object Outliers {

  /** Per-group (q1, q3, lo, hi, n_outliers, n): lo/hi are the Tukey
    * fences q1 - factor*IQR / q3 + factor*IQR; `percentile` is the exact
    * linear-interpolation quantile (matches ANSI quantile_cont).
    */
  def iqrStats(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      factor: Double = 1.5): DataFrame = {
    val keys = keyCols.map(col)
    val quartiles = df.groupBy(keys: _*)
      .agg(percentile(col(valueCol), lit(0.25)).as("q1"),
        percentile(col(valueCol), lit(0.75)).as("q3"))
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
