package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** One-row average precision (the area under the precision-recall
    * curve at distinct-score granularity — the step-interpolation AP:
    * AP = sum over distinct thresholds of (recall step) x precision).
    * The PR curve is the screen that matters when positives are rare
    * (contamination hits, PII, near-dups): ROC AUC stays high on a
    * useless scorer at 1:10^6 imbalance, AP does not. NULL
    * scores/labels drop. Returns n_pos, n_neg, ap (NULL when no
    * positives).
    *
    * Scale shape: the corpus collapses to distinct-score counts in one
    * map-side-combined aggregate; BOTH cumulatives the curve needs
    * (trials and positives through each threshold, descending) come
    * from ONE [[FeatureScale.runningTotalsMultiReleasable]] pass — the
    * recall step at threshold k is p_k / P and the precision is
    * cumP_k / cum_k, so AP is pure arithmetic on the counts. The
    * persisted layout lives until session end in this convenience
    * form; long-lived sessions should use [[averagePrecisionReleasable]].
    */
  def averagePrecision(
      df: DataFrame,
      scoreCol: String,
      labelCol: String): DataFrame =
    averagePrecisionReleasable(df, scoreCol, labelCol)._1

  /** [[averagePrecision]] plus a release() thunk for the persisted
    * prefix-sum layout (same contract as [[aucReleasable]]).
    */
  def averagePrecisionReleasable(
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
    val (cum, release) = FeatureScale.runningTotalsMultiReleasable(
      counts, Seq(col("__s").desc),
      Seq("t" -> col("__t"), "p" -> col("__p")))
    val out = cum
      .agg(
        sum(col("__p")).as("n_pos"),
        (sum(col("__t")) - sum(col("__p"))).as("n_neg"),
        sum(col("__p").cast("double") *
          (col("__cum_p").cast("double") / col("__cum_t")))
          .as("__num"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0,
          col("__num") / col("n_pos").cast("double")).as("ap"))
    (out, release)
  }

  /** Operating-point report: for each candidate threshold, the
    * confusion counts of `score >= threshold` plus the derived
    * accuracy / precision / recall / F1 / Matthews correlation /
    * Cohen's kappa — the table a pipeline owner reads to PICK the
    * threshold the other metrics only average over. Ratios with an
    * empty denominator are NULL (never NaN). NULL scores/labels drop.
    *
    * Scale shape: the threshold list is a literal array exploded
    * against the rows, so the single corpus-scale exchange is one
    * map-side-combined aggregate with |thresholds| groups; everything
    * after is arithmetic on |thresholds| rows.
    */
  def thresholdReport(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholdReport needs thresholds")
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val cell = (p: Column, t: Column) =>
      sum(when(p && t, 1L).otherwise(0L))
    val counted = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(s.as("__s"), y.as("__y"),
        explode(array(thresholds.map(lit): _*)).as("threshold"))
      .groupBy(col("threshold"))
      .agg(
        cell(col("__s") >= col("threshold"), col("__y")).as("tp"),
        cell(col("__s") >= col("threshold"), !col("__y")).as("fp"),
        cell(col("__s") < col("threshold"), col("__y")).as("fn"),
        cell(col("__s") < col("threshold"), !col("__y")).as("tn"))
    val n = (col("tp") + col("fp") + col("fn") + col("tn"))
      .cast("double")
    val prec = when(col("tp") + col("fp") > 0,
      col("tp").cast("double") / (col("tp") + col("fp")))
    val rec = when(col("tp") + col("fn") > 0,
      col("tp").cast("double") / (col("tp") + col("fn")))
    // mcc denominator in doubles: the four marginals multiply past
    // long range at corpus scale
    val mccDen = sqrt(
      (col("tp") + col("fp")).cast("double") *
        (col("tp") + col("fn")).cast("double") *
        (col("tn") + col("fp")).cast("double") *
        (col("tn") + col("fn")).cast("double"))
    val po = (col("tp") + col("tn")).cast("double") / n
    val pe = ((col("tp") + col("fp")).cast("double") *
      (col("tp") + col("fn")) +
      (col("fn") + col("tn")).cast("double") * (col("fp") + col("tn"))) /
      (n * n)
    counted
      .withColumn("accuracy", po)
      .withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("f1",
        when(prec.isNotNull && rec.isNotNull && prec + rec > 0,
          lit(2.0) * prec * rec / (prec + rec)))
      .withColumn("mcc",
        when(mccDen > 0,
          (col("tp").cast("double") * col("tn") -
            col("fp").cast("double") * col("fn")) / mccDen))
      .withColumn("kappa",
        when(pe < 1.0, (po - pe) / (lit(1.0) - pe)))
  }

  /** Per-query ranking quality over (query, item, score, graded
    * relevance) rows: NDCG@k (traditional rel / log2(rank + 1) gain),
    * reciprocal rank of the first relevant item (0.0 when none —
    * averaging these IS MRR), precision@k and recall@k with rel > 0 as
    * the relevance cut. Ranking is score DESC with `itemCol` ASC as
    * the deterministic tie-break; NULL relevance counts as 0; rows
    * with a NULL query/item/score drop. recall@k and NDCG are NULL
    * for queries with no relevant item (precision@k is still 0.0 —
    * the retriever is still wrong to return junk). Returns one row
    * per query: query, n_items, n_rel, dcg, ndcg, rr, precision_at_k,
    * recall_at_k.
    *
    * Scale shape: both windows partition BY QUERY (rank by score,
    * ideal rank by relevance) — parallel across queries at any corpus
    * size, never a global sort; the finish is one hash aggregate per
    * query. A query's own item list is assumed executor-sized (the
    * usual top-N retrieval contract).
    */
  def rankingReport(
      df: DataFrame,
      queryCol: String,
      itemCol: String,
      scoreCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__q"))
      .orderBy(col("__s").desc, col("__i").asc)
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__q"))
      .orderBy(col("__r").desc, col("__i").asc)
    val ranked = df
      .filter(col(queryCol).isNotNull && col(itemCol).isNotNull &&
        col(scoreCol).isNotNull)
      .select(col(queryCol).as("__q"), col(itemCol).as("__i"),
        col(scoreCol).cast("double").as("__s"),
        coalesce(col(relCol).cast("double"), lit(0.0)).as("__r"))
      .withColumn("__rank", row_number().over(w))
      .withColumn("__irank", row_number().over(wIdeal))
    val gain = (r: Column, rank: Column) =>
      sum(when(rank <= k, r / log2(rank.cast("double") + 1.0))
        .otherwise(0.0))
    ranked
      .groupBy(col("__q").as(queryCol))
      .agg(
        count(lit(1)).as("n_items"),
        sum(when(col("__r") > 0, 1L).otherwise(0L)).as("n_rel"),
        gain(col("__r"), col("__rank")).as("dcg"),
        gain(col("__r"), col("__irank")).as("__idcg"),
        min(when(col("__r") > 0, col("__rank"))).as("__first"),
        sum(when(col("__r") > 0 && col("__rank") <= k, 1L)
          .otherwise(0L)).as("__hits"))
      .select(col(queryCol), col("n_items"), col("n_rel"), col("dcg"),
        when(col("__idcg") > 0, col("dcg") / col("__idcg")).as("ndcg"),
        coalesce(lit(1.0) / col("__first"), lit(0.0)).as("rr"),
        (col("__hits").cast("double") / k).as("precision_at_k"),
        when(col("n_rel") > 0,
          col("__hits").cast("double") / col("n_rel"))
          .as("recall_at_k"))
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
