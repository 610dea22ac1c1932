package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification screens for tabular training data — the release
  * gate a dataset must pass before rows leave a trust boundary
  * (complementing the TEXT-side PII scan/redact in [[TextOps]]):
  * k-anonymity (every quasi-identifier combination shared by at least
  * k rows) and l-diversity (every combination covering at least l
  * distinct sensitive values, so group membership does not disclose
  * the attribute).
  *
  * Scale shape: each screen is one map-side-combined `groupBy` over
  * the quasi-identifier columns (the corpus collapses to its QI-group
  * cardinality in a single exchange) followed by a 1-row aggregate —
  * nothing row-sized survives the first shuffle, and NULL QI values
  * form real groups (SQL GROUP BY semantics, the conservative choice:
  * a NULL combination can re-identify too).
  */
object Privacy {

  private def qi(quasiCols: Seq[String]): Seq[Column] = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    quasiCols.map(col)
  }

  /** One-row k-anonymity report: n_rows, n_groups (distinct QI
    * combinations), min_group_size, n_violating_groups (size < k),
    * n_rows_at_risk (rows in violating groups), and `k_anonymous`
    * (no violations). An empty frame reports zeros and passes
    * vacuously.
    */
  def kAnonymityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(qi(quasiCols): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(
        coalesce(sum(col("__n")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("__n")).as("min_group_size"),
        coalesce(sum(when(col("__n") < k, 1L).otherwise(0L)), lit(0L))
          .as("n_violating_groups"),
        coalesce(sum(when(col("__n") < k, col("__n")).otherwise(0L)),
          lit(0L)).as("n_rows_at_risk"))
      .withColumn("k_anonymous", col("n_violating_groups") === 0)
  }

  /** The violating QI groups themselves (size < k), smallest — most
    * identifying — first, bounded to `maxGroups` rows through a
    * TakeOrdered (deterministic tie-break on the QI values; never a
    * global sort). The triage view for fixing a failed
    * [[kAnonymityReport]]: these exact combinations need suppression
    * or generalization.
    */
  def kAnonymityViolations(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long,
      maxGroups: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxGroups >= 1, s"maxGroups must be >= 1, got $maxGroups")
    val cols = qi(quasiCols)
    df.groupBy(cols: _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
      .orderBy(col("group_size").asc +: cols.map(_.asc): _*)
      .limit(maxGroups)
  }

  /** One-row t-closeness report over a CATEGORICAL sensitive column:
    * per QI group, the total-variation distance between the group's
    * sensitive-value distribution and the global one (the EMD under
    * the equal-distance ground metric of the original t-closeness
    * paper's categorical case), then n_groups, max_tvd,
    * n_violating_groups (tvd > t on the 6-dp-rounded value so both
    * engines cut identically), n_rows_at_risk, and `t_close`. NULL
    * sensitive values form a real category (GROUP BY semantics — a
    * skewed NULL rate discloses too).
    *
    * Scale shape: one exchange to (QI, sensitive)-cell counts, after
    * which everything is cell-cardinality-sized — group totals via a
    * QI-partitioned window on the cells (no new exchange past the
    * hash partition), the global distribution and grand total as
    * broadcast joins of sensitive-cardinality / 1-row aggregates.
    * Values absent from a group contribute their full global share,
    * folded in closed form: tvd = (sum |p_g - p| + 1 - sum p) / 2
    * over the PRESENT cells only — no dense group x value expansion.
    */
  def tClosenessReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      t: Double): DataFrame = {
    require(t > 0 && t < 1, s"t must be in (0, 1), got $t")
    val qiCols = qi(quasiCols)
    val cells = df
      .groupBy(qiCols :+ col(sensitiveCol).as("__s"): _*)
      .agg(count(lit(1)).as("__nc"))
    val globalDist = cells.groupBy(col("__s"))
      .agg(sum(col("__nc")).as("__ns"))
    val total = cells.agg(sum(col("__nc")).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    val perGroup = cells
      .join(broadcast(globalDist.withColumnRenamed("__s", "__s2")),
        col("__s") <=> col("__s2"))
      .crossJoin(broadcast(total))
      .withColumn("__ng", sum(col("__nc")).over(w))
      .groupBy(qiCols :+ col("__ng"): _*)
      .agg(
        (
          (sum(abs(col("__nc") * lit(1.0) / col("__ng") -
            col("__ns") * lit(1.0) / col("__n"))) +
            lit(1.0) -
            sum(col("__ns") * lit(1.0) / col("__n"))) / lit(2.0)
        ).as("__tvd"))
      .withColumn("__tvd_r", round(col("__tvd"), 6) + lit(0.0))
    perGroup.agg(
      coalesce(sum(col("__ng")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_groups"),
      coalesce(round(max(col("__tvd")), 6) + lit(0.0), lit(0.0))
        .as("max_tvd"),
      coalesce(sum(when(col("__tvd_r") > t, 1L).otherwise(0L)), lit(0L))
        .as("n_violating_groups"),
      coalesce(sum(when(col("__tvd_r") > t, col("__ng")).otherwise(0L)),
        lit(0L)).as("n_rows_at_risk"))
      .withColumn("t_close", col("n_violating_groups") === 0)
  }

  /** One-row (distinct) l-diversity report over a sensitive column:
    * n_groups, min_distinct_sensitive, n_violating_groups (groups
    * covering < l distinct sensitive values), n_rows_at_risk, and
    * `l_diverse`. Rows with a NULL sensitive value keep their group's
    * row count but contribute no diversity (COUNT DISTINCT skips
    * NULL — a group of only-NULL sensitives has diversity 0 and
    * always violates).
    */
  def lDiversityReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(qi(quasiCols): _*)
      .agg(count(lit(1)).as("__n"),
        count_distinct(col(sensitiveCol)).as("__d"))
      .agg(
        count(lit(1)).as("n_groups"),
        min(col("__d")).as("min_distinct_sensitive"),
        coalesce(sum(when(col("__d") < l, 1L).otherwise(0L)), lit(0L))
          .as("n_violating_groups"),
        coalesce(sum(when(col("__d") < l, col("__n")).otherwise(0L)),
          lit(0L)).as("n_rows_at_risk"))
      .withColumn("l_diverse", col("n_violating_groups") === 0)
  }
}
