package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-level association statistics — the column-relationship layer
  * of profiling that the per-column trackers (graft.metrics) don't
  * cover: pairwise Pearson correlation over numeric columns and
  * MI / chi-squared / Cramér's V between categorical columns. Both are
  * standard feature-selection and leakage screens run over training
  * corpora before a model ever sees the data.
  *
  * Scale shape: [[corrMatrix]] is ONE aggregation job — every pairwise
  * `corr`/`covar_samp` is a map-side-combined CentralMomentAgg, so the
  * input scans once and the shuffle carries p·(p-1)/2 moment buffers,
  * independent of row count. [[categoricalAssociation]] reduces the
  * input to its contingency cells with one hash aggregate (bounded by
  * |A|·|B|, not rows); marginals are re-aggregations of the cell table
  * and broadcast back — the raw input shuffles once and nothing
  * row-sized moves after that.
  */
object Stats {

  /** Long-form pairwise Pearson correlation + sample covariance over
    * `cols` (each cast to double; rows where either side is NULL are
    * excluded pairwise, matching SQL `corr`). One row per unordered
    * pair (a, b) with a < b in `cols` order. Single scan, single
    * 1-row aggregate — no shuffle of input rows.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "columns must be distinct")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.flatMap { case (a, b) =>
      val (ca, cb) = (col(a).cast("double"), col(b).cast("double"))
      Seq(
        corr(ca, cb).as(s"__corr_${a}_$b"),
        covar_samp(ca, cb).as(s"__cov_${a}_$b"),
        count(when(ca.isNotNull && cb.isNotNull, 1)).as(s"__n_${a}_$b"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__corr_${a}_$b").as("pearson"),
        col(s"__cov_${a}_$b").as("covariance"),
        col(s"__n_${a}_$b").as("n"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Association between two categorical columns: one row with
    * `mi` (mutual information, nats), `chi2` (Pearson's chi-squared
    * statistic), `cramers_v`, `n` (non-null pair count), and the
    * distinct cardinalities `card_a` / `card_b`. NULL on either side
    * excludes the row (pairwise deletion, matching the SQL oracle).
    *
    * chi-squared over the FULL |A|x|B| grid without materializing
    * empty cells: sum over all cells of the expected count e is
    * exactly n, so chi2 = sum_observed((o-e)^2/e) + (n - sum_observed(e)).
    */
  def categoricalAssociation(df: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).as("__a"), col(colB).as("__b"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val ra = cells.groupBy(col("__a")).agg(sum(col("__c")).as("__ra"))
    val rb = cells.groupBy(col("__b")).agg(sum(col("__c")).as("__rb"))
    val tot = cells.agg(sum(col("__c")).as("__n"),
      count_distinct(col("__a")).cast("double").as("__ka"),
      count_distinct(col("__b")).cast("double").as("__kb"))
    val e = col("__ra") * col("__rb") / col("__n")
    cells
      .join(broadcast(ra), "__a")
      .join(broadcast(rb), "__b")
      .crossJoin(broadcast(tot))
      .agg(
        sum(col("__c") / col("__n") *
          log(col("__c") * col("__n") / (col("__ra") * col("__rb")))).as("mi"),
        (sum(pow(col("__c") - e, 2) / e) +
          first(col("__n")) - sum(e)).as("chi2"),
        first(col("__n")).cast("long").as("n"),
        first(col("__ka")).cast("long").as("card_a"),
        first(col("__kb")).cast("long").as("card_b"))
      .withColumn("cramers_v",
        when(least(col("card_a"), col("card_b")) > 1,
          sqrt(col("chi2") / (col("n") *
            (least(col("card_a"), col("card_b")) - lit(1))))))
      .select(col("mi"), col("chi2"), col("cramers_v"),
        col("n"), col("card_a"), col("card_b"))
  }

  /** Feature-relevance ranking: [[categoricalAssociation]] of each
    * candidate feature column against ONE label column — the
    * model-prep screen for "which columns carry signal" (mutual
    * information in nats, chi-squared, Cramér's V side by side; MI
    * and V agree on ordering only when cardinalities are comparable,
    * which is why both ship). One row per feature; NULL on either
    * side excludes the row pairwise, matching the per-pair oracle.
    *
    * Scale shape: one contingency-cell aggregate per feature (the
    * candidate list is user-bounded), each collapsing the corpus to
    * its |feature| x |label| observed-cell grid; unions of 1-row
    * summaries. A high-cardinality feature's grid is the thing that
    * grows — bucket such features first (the chi-squared of a
    * near-unique key is meaningless anyway).
    */
  def featureRelevance(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    featureCols.map { f =>
      categoricalAssociation(df, f, labelCol)
        .select(lit(f).as("feature"), col("mi"), col("chi2"),
          col("cramers_v"), col("n"),
          col("card_a").as("card_feature"),
          col("card_b").as("card_label"))
    }.reduce(_ unionAll _)
  }
}
