package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Score-quality evaluation beyond the confusion matrix: ROC AUC and
  * calibration — the two screens a binary scorer needs before its
  * scores gate a data pipeline (quality classifiers, dedup rankers,
  * contamination detectors all emit scores whose THRESHOLD someone
  * must trust).
  *
  * Scale shape: AUC is the rank statistic (one sort via a window over
  * the score ordering, then a 1-row aggregate — no pairwise join);
  * calibration is one hash aggregate over at most `nBins` cells.
  */
object ModelEval {

  /** ROC AUC by the Mann-Whitney rank identity:
    * AUC = (sum of positive ranks - nPos(nPos+1)/2) / (nPos * nNeg),
    * with AVERAGE ranks on score ties (the exact tie-corrected AUC —
    * equal scores contribute 1/2, matching the probabilistic
    * definition P(s+ > s-) + P(s+ = s-)/2). NULL scores/labels drop.
    * Returns one row: n_pos, n_neg, auc (NULL when either class is
    * empty).
    */
  def auc(
      df: DataFrame,
      scoreCol: String,
      labelCol: String): DataFrame = {
    val base = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
    // average rank = (2*min_rank + tie_count - 1) / 2; min_rank via
    // the rank() window, tie counts via a partition on the score
    val wOrd = Window.orderBy(col("__s"))
    val wTie = Window.partitionBy(col("__s"))
    base
      .withColumn("__r", rank().over(wOrd))
      .withColumn("__t", count(lit(1)).over(wTie))
      .withColumn("__ar",
        (lit(2) * col("__r") + col("__t") - 1).cast("double") / 2)
      .agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("__y"), col("__ar"))).as("__rp"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("__rp") - col("n_pos").cast("double") *
            (col("n_pos") + 1) / 2) /
            (col("n_pos").cast("double") * col("n_neg")))
          .as("auc"))
  }

  /** Reliability table over `nBins` equal-width score bins on [0, 1]:
    * per non-empty bin — bin (0-based), n, mean_score (confidence),
    * frac_pos (accuracy), |gap|. Scores clamp into [0, 1]; bin =
    * min(floor(s * nBins), nBins - 1) so s = 1.0 lands in the last
    * bin. One hash aggregate; nothing row-sized survives it.
    */
  def calibrationReport(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val s = least(greatest(col(scoreCol).cast("double"), lit(0.0)),
      lit(1.0))
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(least(floor(s * nBins), lit(nBins - 1)).cast("long")
        .as("bin"),
        s.as("__s"),
        col(labelCol).cast("boolean").cast("int").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        avg(col("__s")).as("mean_score"),
        avg(col("__y")).as("frac_pos"))
      .withColumn("gap", abs(col("mean_score") - col("frac_pos")))
  }

  /** Expected calibration error: sum over bins of |gap| weighted by
    * bin mass. One number from the [[calibrationReport]] cells.
    */
  def ece(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame =
    calibrationReport(df, scoreCol, labelCol, nBins)
      .agg((sum(col("gap") * col("n")) / sum(col("n"))).as("ece"),
        sum(col("n")).as("n"))
}
