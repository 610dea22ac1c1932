package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score-quality evaluation beyond the confusion matrix: ROC AUC and
  * calibration — the two screens a binary scorer needs before its
  * scores gate a data pipeline (quality classifiers, dedup rankers,
  * contamination detectors all emit scores whose THRESHOLD someone
  * must trust).
  *
  * Scale shape: AUC is the rank statistic computed on the
  * DISTINCT-SCORE counts table (one map-side-combined aggregate
  * collapses the corpus, then the [[FeatureScale]] distributed prefix
  * sum ranks the counts — never a single-partition sort of the scored
  * rows, never a pairwise join); calibration is one hash aggregate
  * over at most `nBins` cells.
  */
object ModelEval {

  /** ROC AUC by the Mann-Whitney rank identity:
    * AUC = (sum of positive ranks - nPos(nPos+1)/2) / (nPos * nNeg),
    * with AVERAGE ranks on score ties (the exact tie-corrected AUC —
    * equal scores contribute 1/2, matching the probabilistic
    * definition P(s+ > s-) + P(s+ = s-)/2). NULL scores/labels drop.
    * Returns one row: n_pos, n_neg, auc (NULL when either class is
    * empty).
    *
    * The distinct-score layout persists until the session drops it;
    * callers running many evaluations in one session should prefer
    * [[aucReleasable]] and release after materializing.
    */
  def auc(
      df: DataFrame,
      scoreCol: String,
      labelCol: String): DataFrame =
    aucReleasable(df, scoreCol, labelCol)._1

  /** [[auc]] plus a release() thunk for the persisted distinct-score
    * counts layout.
    *
    * Plan: `groupBy(score)` collapses N scored rows to (score,
    * tie_count, pos_count) cells — the only corpus-scale exchange —
    * then [[FeatureScale.runningTotalsReleasable]] prefix-sums the tie
    * counts in score order. The tie group ending at inclusive count c
    * with t members spans ranks (c-t+1)..c, so its average rank is
    * (c-t) + (t+1)/2 — pure arithmetic on the counts, no row of the
    * original corpus crosses a window. (The previous revision ranked
    * every scored row through `rank().over(Window.orderBy(score))`,
    * which funnels the entire score table into ONE partition — correct
    * at test scale, a scale-killer at 100 TB of scores.)
    */
  def aucReleasable(
      df: DataFrame,
      scoreCol: String,
      labelCol: String): (DataFrame, () => Unit) = {
    val counts = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__t"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__p"))
    val (cum, release) = FeatureScale.runningTotalsReleasable(
      counts, Seq(col("__s")), col("__t"))
    val out = cum
      .withColumn("__ar",
        (col("__cum") - col("__t")).cast("double") +
          (col("__t") + 1).cast("double") / 2)
      .agg(
        sum(col("__p")).as("n_pos"),
        (sum(col("__t")) - sum(col("__p"))).as("n_neg"),
        sum(col("__p") * col("__ar")).as("__rp"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("__rp") - col("n_pos").cast("double") *
            (col("n_pos") + 1) / 2) /
            (col("n_pos").cast("double") * col("n_neg")))
          .as("auc"))
    (out, release)
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

  /** One-row Brier score: mean squared gap between the predicted
    * probability and the 0/1 outcome — the strictly proper scoring
    * rule that penalizes BOTH miscalibration and lack of resolution
    * (the [[ece]] measures only the former; AUC only the ranking).
    * Also reports the base rate, whose Brier for a constant
    * base-rate predictor is base_rate x (1 - base_rate) — the
    * skill reference. One map-side-combined aggregate.
    */
  def brierScore(
      df: DataFrame,
      scoreCol: String,
      labelCol: String): DataFrame = {
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean").cast("int").cast("double")
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        avg((s - y) * (s - y)).as("brier"),
        avg(y).as("base_rate"))
  }

  /** Decile lift / cumulative-gains table: scored rows rank from the
    * TOP score down and cut into `nBins` equal-population bins at
    * distinct-score granularity (a tie group lands whole in the bin of
    * its last row — ties are indistinguishable to the model, so they
    * must not straddle a marketing cut). Per bin: n, n_pos, pos_rate,
    * cum_capture (fraction of ALL positives found through this bin —
    * the gains curve), lift (pos_rate over the base rate).
    *
    * Scale shape: the corpus collapses to distinct-score counts in one
    * map-side-combined aggregate; ranking is the
    * [[FeatureScale.runningTotalsReleasable]] distributed prefix sum
    * over score DESC (never a single-partition corpus window); the bin
    * table is <= nBins rows, so its cumulative windows are bounded by
    * construction. Bin assignment is ceil(nBins x cum/n) via
    * floor((cum x nBins + n - 1) / n) — exact in doubles for
    * cum x nBins < 2^52.
    */
  def liftTable(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int = 10): DataFrame =
    // the persisted prefix-sum layout lives until session end in this
    // convenience form — long-lived sessions should use
    // [[liftTableReleasable]] (the aucReleasable contract)
    liftTableReleasable(df, scoreCol, labelCol, nBins)._1

  /** [[liftTable]] plus a release() thunk for the persisted prefix-sum
    * layout (same contract as [[aucReleasable]]).
    */
  def liftTableReleasable(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBins: Int = 10): (DataFrame, () => Unit) = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    val counts = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("__s"),
        col(labelCol).cast("boolean").as("__y"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__t"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__p"))
    val (cum, release) = FeatureScale.runningTotalsReleasable(
      counts, Seq(col("__s").desc), col("__t"))
    val binned = cum
      .withColumn("bin",
        least(lit(nBins.toLong), floor(
          (col("__cum") * nBins + col("__n") - lit(1L)) /
            col("__n").cast("double")).cast("long")))
      .groupBy(col("bin"))
      .agg(sum(col("__t")).as("n"), sum(col("__p")).as("n_pos"))
    // <= nBins rows from here: the unpartitioned windows are bounded
    // by the aggregate above (the kaplanMeier distinct-times argument)
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val out = binned
      .withColumn("__cp", sum(col("n_pos")).over(wCum))
      .withColumn("__tp", sum(col("n_pos")).over(wAll))
      .withColumn("__tn", sum(col("n")).over(wAll))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n")).as("pos_rate"),
        when(col("__tp") > 0,
          col("__cp").cast("double") / col("__tp")).as("cum_capture"),
        when(col("__tp") > 0,
          (col("n_pos").cast("double") / col("n")) /
            (col("__tp").cast("double") / col("__tn"))).as("lift"))
    (out, release)
  }
}
