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

  /** Exact distribution shape of one categorical column: n (non-null),
    * cardinality, Shannon entropy (nats), Gini impurity (1 - sum p^2),
    * normalized entropy (over ln cardinality — 1.0 is uniform, the
    * comparable-across-columns form), and top_share (the majority
    * class's mass — a 0.99 here means the column is nearly constant
    * and every model metric stratified on it is fiction). The EXACT
    * twin of the frequent-items sketch summary: run this when the
    * column is known-low-cardinality and the number must be exact.
    * NULLs carry no mass.
    *
    * Scale shape: one map-side-combined count aggregate to the
    * distinct values, then a 1-row reduction of the count table.
    */
  def categoricalProfile(df: DataFrame, colName: String): DataFrame = {
    val counts = df
      .filter(col(colName).isNotNull)
      .groupBy(col(colName).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val totals = counts.agg(sum(col("__c")).as("__n"))
    counts.crossJoin(broadcast(totals))
      .select(col("__c"), col("__n"),
        (col("__c").cast("double") / col("__n")).as("__p"))
      .agg(
        first(col("__n")).as("n"),
        count(lit(1)).as("cardinality"),
        (-sum(col("__p") * log(col("__p")))).as("entropy"),
        (lit(1.0) - sum(col("__p") * col("__p"))).as("gini_impurity"),
        (max(col("__c")).cast("double") / first(col("__n")))
          .as("top_share"))
      .withColumn("normalized_entropy",
        when(col("cardinality") > 1,
          col("entropy") / log(col("cardinality").cast("double")))
          .otherwise(0.0))
      .select(col("n"), col("cardinality"), col("entropy"),
        col("normalized_entropy"), col("gini_impurity"),
        col("top_share"))
  }

  /** Welch's unequal-variance t-test between two named groups of
    * `valueCol`: the A/B-test workhorse that does NOT assume the
    * variants share a variance (Student's pooled test silently lies
    * when the treatment changes the spread, which treatments do).
    * One row: n_a, n_b, mean_a, mean_b, diff (a - b), se, t_stat,
    * df (Welch-Satterthwaite). t_stat/df are NULL when either group
    * has < 2 values or both variances are 0. No p-value column by
    * design — erf is not portable arithmetic; at pipeline scale df is
    * huge and |t| > 1.96 IS the 5% normal read, which the caller
    * applies.
    *
    * Scale shape: ONE map-side-combined aggregate (conditional
    * count/avg/var_samp per group) — the corpus never shuffles.
    */
  def welchTTest(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame =
    welchTTestBy(df, Nil, groupCol, valueCol, groupA, groupB)

  /** [[welchTTest]] per `keys` segment — the experiment-readout table
    * ("which user segments actually moved"): one t-test row per key
    * combination, ALL segments from ONE map-side-combined aggregate
    * (running the global test per segment in a loop would scan the
    * corpus |segments| times). A segment where either arm has < 2
    * values reports NULL t/df — it is in the table, visibly
    * underpowered, rather than silently absent. Interpret jointly:
    * k segments at 5% means k/20 false flags; that multiple-testing
    * correction is the caller's policy.
    */
  def welchTTestBy(
      df: DataFrame,
      keys: Seq[String],
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val g = col(groupCol).cast("string")
    val va = when(g === groupA, v)
    val vb = when(g === groupB, v)
    val base = df.filter(v.isNotNull && (g === groupA || g === groupB))
    val grouped =
      if (keys.isEmpty) base.groupBy()
      else base.groupBy(keys.map(col): _*)
    val stats = grouped
      .agg(
        count(va).as("n_a"), count(vb).as("n_b"),
        avg(va).as("mean_a"), avg(vb).as("mean_b"),
        var_samp(va).as("__va"), var_samp(vb).as("__vb"))
    val sa = col("__va") / col("n_a")
    val sb = col("__vb") / col("n_b")
    val se = sqrt(sa + sb)
    stats
      .withColumn("diff", col("mean_a") - col("mean_b"))
      .withColumn("se", se)
      .withColumn("t_stat",
        when(col("n_a") > 1 && col("n_b") > 1 && se > 0,
          col("diff") / se))
      .withColumn("df",
        when(col("n_a") > 1 && col("n_b") > 1 && se > 0,
          pow(sa + sb, 2.0) /
            (pow(sa, 2.0) / (col("n_a") - 1) +
              pow(sb, 2.0) / (col("n_b") - 1))))
      .select((keys.map(col) ++ Seq(col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"), col("diff"), col("se"),
        col("t_stat"), col("df"))): _*)
  }

  /** Mann-Whitney U test between two named groups — the rank-based
    * twin of [[welchTTest]] for skewed / heavy-tailed metrics
    * (latencies, revenues) where a mean test answers the wrong
    * question. U counts (a > b) pairs with ties at half weight
    * (U = n_a * n_b * AUC — same statistic the ROC measures); z is
    * the tie-corrected normal approximation, no continuity
    * correction. One row: n_a, n_b, u, z (z NULL when either group
    * is empty or all values tie).
    *
    * Scale shape: the [[ModelEval.auc]] plan — one aggregate to
    * distinct-value counts, average ranks via the
    * [[FeatureScale.runningTotalsReleasable]] distributed prefix sum,
    * then pure arithmetic (the tie-correction term sums t^3 - t over
    * the same counts). Never a single-partition sort, never a
    * pairwise join. The persisted counts layout lives until session
    * end in this convenience form (the aucReleasable contract).
    */
  def mannWhitney(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val g = col(groupCol).cast("string")
    val counts = df
      .filter(v.isNotNull && (g === groupA || g === groupB))
      .select(v.as("__v"), (g === groupA).as("__a"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("__t"),
        sum(when(col("__a"), 1L).otherwise(0L)).as("__p"))
    val (cum, release) = FeatureScale.runningTotalsReleasable(
      counts, Seq(col("__v")), col("__t"))
    val _ = release
    val out = cum
      .withColumn("__ar",
        (col("__cum") - col("__t")).cast("double") +
          (col("__t") + 1).cast("double") / 2)
      .agg(
        sum(col("__p")).as("n_a"),
        (sum(col("__t")) - sum(col("__p"))).as("n_b"),
        sum(col("__p") * col("__ar")).as("__ra"),
        sum(col("__t").cast("double") * col("__t") * col("__t") -
          col("__t")).as("__ties"))
    val n = (col("n_a") + col("n_b")).cast("double")
    val u = col("__ra") - col("n_a").cast("double") *
      (col("n_a") + 1) / 2
    val sigma = sqrt(
      col("n_a").cast("double") * col("n_b") / 12.0 *
        ((n + 1) - col("__ties") / (n * (n - 1))))
    out
      .withColumn("u", u)
      .withColumn("z",
        when(col("n_a") > 0 && col("n_b") > 0 && sigma > 0,
          (u - col("n_a").cast("double") * col("n_b") / 2) / sigma))
      .select(col("n_a"), col("n_b"), col("u"), col("z"))
  }

  /** Two-sample proportion z-test (pooled) between two named groups:
    * the conversion-rate A/B test. `successCol` casts to boolean;
    * NULL successes drop. One row: n_a, n_b, p_a, p_b, diff (a - b),
    * z (pooled-variance normal statistic; NULL when either group is
    * empty or the pooled rate is degenerate 0/1). One
    * map-side-combined aggregate.
    */
  def proportionTest(
      df: DataFrame,
      groupCol: String,
      successCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val g = col(groupCol).cast("string")
    val y = col(successCol).cast("boolean")
    val inA = g === groupA
    val stats = df
      .filter(y.isNotNull && (g === groupA || g === groupB))
      .agg(
        sum(when(inA, 1L).otherwise(0L)).as("n_a"),
        sum(when(!inA, 1L).otherwise(0L)).as("n_b"),
        sum(when(inA && y, 1L).otherwise(0L)).as("__sa"),
        sum(when(!inA && y, 1L).otherwise(0L)).as("__sb"))
    val pa = col("__sa").cast("double") / col("n_a")
    val pb = col("__sb").cast("double") / col("n_b")
    val pooled = (col("__sa") + col("__sb")).cast("double") /
      (col("n_a") + col("n_b"))
    val se = sqrt(pooled * (lit(1.0) - pooled) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    stats.select(col("n_a"), col("n_b"),
      pa.as("p_a"), pb.as("p_b"), (pa - pb).as("diff"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
        (pa - pb) / se).as("z"))
  }

  /** CUPED variance reduction (Deng et al.): adjust a metric by its
    * pre-experiment covariate, `adjusted = y - theta * (x - mean_x)`
    * with `theta = cov(x, y) / var(x)` — the experimentation-platform
    * transform that shrinks metric variance by the covariate's R^2
    * without biasing the group-mean DIFFERENCE (every group shifts by
    * the same global theta/mean). Rows where either side is NULL get
    * a NULL `adjusted` but pass through. Run [[welchTTest]] on
    * `adjusted` afterwards — same decision, tighter interval.
    *
    * Scale shape: one moment aggregate (cov/var/mean), broadcast back
    * as a 1-row; the adjustment is a pure projection — the corpus
    * never shuffles.
    */
  def cuped(
      df: DataFrame,
      metricCol: String,
      covariateCol: String,
      outCol: String = "adjusted"): DataFrame = {
    val y = col(metricCol).cast("double")
    val x = col(covariateCol).cast("double")
    val stats = df.agg(
      covar_samp(x, y).as("__cov"),
      var_samp(x).as("__var"),
      avg(x).as("__mx"))
    df.crossJoin(broadcast(stats))
      .withColumn(outCol,
        when(col("__var") > 0,
          y - col("__cov") / col("__var") * (x - col("__mx")))
          .otherwise(y))
      .drop("__cov", "__var", "__mx")
  }

  /** Simpson's-paradox screen: does the pooled treatment-control mean
    * difference of `metricCol` keep its SIGN after stratifying by
    * `strataCol`? Reports the pooled diff, the stratum-size-weighted
    * diff over strata containing BOTH arms, how many such strata
    * disagree in sign with the pooled read, and `flipped` — the
    * pooled and stratified estimates pointing opposite ways, the
    * classic confounded-experiment smell (the strata are imbalanced
    * across arms AND predictive of the metric). One row: n, n_strata
    * (with both arms), pooled_diff, stratified_diff,
    * n_disagreeing_strata, flipped. NULL diffs when an arm is empty.
    *
    * Scale shape: one hash aggregate to (stratum, arm) cells, then
    * arithmetic on the stratum table — the corpus shuffles once.
    */
  def simpsonCheck(
      df: DataFrame,
      treatCol: String,
      metricCol: String,
      strataCol: String): DataFrame = {
    val y = col(metricCol).cast("double")
    val tr = col(treatCol).cast("boolean")
    val cells = df
      .filter(y.isNotNull && tr.isNotNull)
      .groupBy(col(strataCol).as("__s"))
      .agg(
        sum(when(tr, 1L).otherwise(0L)).as("__nt"),
        sum(when(!tr, 1L).otherwise(0L)).as("__nc"),
        sum(when(tr, y).otherwise(0.0)).as("__st"),
        sum(when(!tr, y).otherwise(0.0)).as("__sc"))
    val diff = col("__st") / col("__nt") - col("__sc") / col("__nc")
    val both = col("__nt") > 0 && col("__nc") > 0
    val totals = cells.agg(
      sum(col("__st")).as("__stAll"), sum(col("__nt")).as("__ntAll"),
      sum(col("__sc")).as("__scAll"), sum(col("__nc")).as("__ncAll"))
    val pooled =
      when(col("__ntAll") > 0 && col("__ncAll") > 0,
        col("__stAll") / col("__ntAll") -
          col("__scAll") / col("__ncAll"))
    // one pass over the stratum table with the 1-row totals alongside:
    // the per-stratum sign test needs the pooled diff on every row
    cells.crossJoin(broadcast(totals))
      .agg(
        sum(col("__nt") + col("__nc")).as("n"),
        sum(when(both, 1L).otherwise(0L)).as("n_strata"),
        first(pooled).as("pooled_diff"),
        (sum(when(both,
          (col("__nt") + col("__nc")).cast("double") * diff)) /
          sum(when(both, (col("__nt") + col("__nc")).cast("double"))))
          .as("stratified_diff"),
        sum(when(both && pooled.isNotNull &&
          signum(diff) =!= signum(pooled), 1L).otherwise(0L))
          .as("n_disagreeing_strata"))
      .withColumn("flipped",
        col("pooled_diff").isNotNull &&
          col("stratified_diff").isNotNull &&
          signum(col("pooled_diff")) =!=
          signum(col("stratified_diff")))
  }

  /** Trimmed mean of `valueCol`: the mean over values inside the
    * EXACT [loQ, hiQ] discrete-quantile cuts (inclusive) — the robust
    * location metric for heavy-tailed A/B reads (one whale order moves
    * a raw mean; it cannot move the 1-99% trimmed mean). Cuts come
    * from [[FeatureScale.exactQuantiles]] (bit-exact, reproducible —
    * an approx-quantile cut drifts run to run) and broadcast back; the
    * trim itself is one filtered aggregate. One row: n, n_kept, lo_cut,
    * hi_cut, trimmed_mean.
    */
  def trimmedMean(
      df: DataFrame,
      valueCol: String,
      loQ: Double,
      hiQ: Double): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ,
      s"need 0 <= loQ < hiQ <= 1, got ($loQ, $hiQ)")
    val v = col(valueCol).cast("double")
    val cuts = FeatureScale.exactQuantiles(df, valueCol, Seq(loQ, hiQ))
      .groupBy()
      .agg(
        max(when(col("q") === loQ, col("value"))).as("__lo"),
        max(when(col("q") === hiQ, col("value"))).as("__hi"))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(cuts))
      .agg(count(lit(1)).as("n"),
        sum(when(v >= col("__lo") && v <= col("__hi"), 1L)
          .otherwise(0L)).as("n_kept"),
        first(col("__lo")).as("lo_cut"),
        first(col("__hi")).as("hi_cut"),
        avg(when(v >= col("__lo") && v <= col("__hi"), v))
          .as("trimmed_mean"))
  }

  /** Ratio-metric A/B test with delta-method variance: for unit-level
    * (numerator, denominator) pairs — clicks and views per user,
    * revenue and sessions per account — the metric is
    * `R = sum(num) / sum(den)`, NOT the mean of per-unit ratios
    * (which over-weights tiny denominators). Per group the delta
    * method gives Var(R) ~ (var(x) - 2 R cov(x,y) + R^2 var(y)) /
    * (n * mean(y)^2); z compares the two groups on independent
    * normals. One row: n_a, n_b, ratio_a, ratio_b, diff, se, z (NULL
    * when a group is degenerate). One map-side-combined moment
    * aggregate — the units never shuffle.
    */
  def ratioTest(
      df: DataFrame,
      groupCol: String,
      numCol: String,
      denCol: String,
      groupA: String,
      groupB: String): DataFrame = {
    val g = col(groupCol).cast("string")
    val x = col(numCol).cast("double")
    val y = col(denCol).cast("double")
    def arm(isA: Boolean, suffix: String) = {
      val in = if (isA) g === groupA else g === groupB
      Seq(
        sum(when(in, 1L).otherwise(0L)).as(s"n_$suffix"),
        sum(when(in, x).otherwise(0.0)).as(s"__sx_$suffix"),
        sum(when(in, y).otherwise(0.0)).as(s"__sy_$suffix"),
        var_samp(when(in, x)).as(s"__vx_$suffix"),
        var_samp(when(in, y)).as(s"__vy_$suffix"),
        covar_samp(when(in, x), when(in, y)).as(s"__cxy_$suffix"))
    }
    val aggs = arm(isA = true, "a") ++ arm(isA = false, "b")
    val stats = df
      .filter(x.isNotNull && y.isNotNull &&
        (g === groupA || g === groupB))
      .agg(aggs.head, aggs.tail: _*)
    def ratio(s: String) = col(s"__sx_$s") / col(s"__sy_$s")
    def se2(s: String) = {
      val r = ratio(s)
      val my = col(s"__sy_$s") / col(s"n_$s")
      (col(s"__vx_$s") - lit(2.0) * r * col(s"__cxy_$s") +
        r * r * col(s"__vy_$s")) / (col(s"n_$s") * my * my)
    }
    stats
      .withColumn("ratio_a",
        when(col("__sy_a") =!= 0.0, ratio("a")))
      .withColumn("ratio_b",
        when(col("__sy_b") =!= 0.0, ratio("b")))
      .withColumn("diff", col("ratio_a") - col("ratio_b"))
      .withColumn("se",
        when(col("n_a") > 1 && col("n_b") > 1,
          sqrt(se2("a") + se2("b"))))
      .withColumn("z",
        when(col("se") > 0, col("diff") / col("se")))
      .select(col("n_a"), col("n_b"), col("ratio_a"), col("ratio_b"),
        col("diff"), col("se"), col("z"))
  }

  /** Sample-ratio-mismatch check: observed per-group counts against
    * the DESIGNED allocation — the first thing to read on any
    * experiment dashboard (a 50/50 split arriving 52/48 means the
    * assignment or logging is broken and every downstream p-value is
    * fiction). `expected` lists (group, weight); weights normalize
    * over the listed groups. Returns one row per listed group (group,
    * n_obs, n_expected, contrib) — a group with NO observed rows
    * still appears with n_obs 0 — plus the totals on every row:
    * n (observed in listed groups), n_unlisted (rows in groups the
    * design never mentioned — nonzero IS the mismatch), chi2
    * (sum of contribs, df = k - 1).
    *
    * Scale shape: one count aggregate; the expected table is a
    * k-row literal; totals ride back on a broadcast.
    */
  def srmCheck(
      df: DataFrame,
      groupCol: String,
      expected: Seq[(String, Double)]): DataFrame = {
    require(expected.nonEmpty, "srmCheck needs expected allocations")
    require(expected.map(_._1).distinct.size == expected.size,
      "expected groups must be distinct")
    require(expected.forall(_._2 > 0), "expected weights must be > 0")
    val wTotal = expected.map(_._2).sum
    val g = col(groupCol).cast("string")
    val spark = df.sparkSession
    import spark.implicits._
    val exp = expected.map { case (k, w) => (k, w / wTotal) }
      .toDF("group", "__share")
    val listed = expected.map(_._1)
    val obs = df
      .filter(g.isNotNull)
      .groupBy(g.as("group"))
      .agg(count(lit(1)).as("__o"))
    val totals = obs.agg(
      sum(when(col("group").isin(listed: _*), col("__o"))
        .otherwise(0L)).as("n"),
      sum(when(col("group").isin(listed: _*), 0L)
        .otherwise(col("__o"))).as("n_unlisted"))
    val cells = exp
      .join(obs, Seq("group"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("n_obs", coalesce(col("__o"), lit(0L)))
      .withColumn("n_expected", col("__share") * col("n"))
      .withColumn("contrib",
        when(col("n_expected") > 0,
          pow(col("n_obs") - col("n_expected"), 2.0) /
            col("n_expected")))
    val chi2 = cells.agg(sum(col("contrib")).as("chi2"))
    cells.crossJoin(broadcast(chi2))
      .select(col("group"), col("n_obs"),
        col("n_expected"), col("contrib"), col("n"),
        col("n_unlisted"), col("chi2"))
  }

  /** Quantile treatment effects: the per-quantile gap between two
    * groups' EXACT value distributions — the distributional A/B read
    * the mean tests miss entirely (a treatment that helps the p10
    * users and hurts the p90 users nets to zero in [[welchTTest]];
    * it does not here). One row per q: q, n_a, n_b, value_a, value_b,
    * qte (a - b). Quantiles are [[FeatureScale.exactQuantiles]]
    * keyed by group — discrete, reproducible, never interpolated.
    */
  def quantileTreatmentEffects(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[Double],
      groupA: String,
      groupB: String): DataFrame = {
    val g = col(groupCol).cast("string")
    val sub = df
      .filter(g === groupA || g === groupB)
      .withColumn("__g", g)
    val quants = FeatureScale.exactQuantiles(sub, valueCol, qs,
      keys = Seq("__g"))
    val a = quants.filter(col("__g") === groupA)
      .select(col("q"), col("n").as("n_a"),
        col("value").cast("double").as("value_a"))
    val b = quants.filter(col("__g") === groupB)
      .select(col("q"), col("n").as("n_b"),
        col("value").cast("double").as("value_b"))
    a.join(b, Seq("q"), "full")
      .select(col("q"), col("n_a"), col("n_b"), col("value_a"),
        col("value_b"), (col("value_a") - col("value_b")).as("qte"))
  }

  /** Inter-rater agreement between two label columns (human-label QA
    * before labels gate a pipeline): observed agreement po, chance
    * agreement pe (product of marginals), and Cohen's kappa
    * (po - pe) / (1 - pe) — raw accuracy flatters raters who both
    * spam the majority class; kappa does not. Rows where either side
    * is NULL drop (an abstention is not a rating). One row: n, po,
    * pe, kappa (NULL when pe = 1, i.e. both raters constant).
    *
    * Scale shape: one hash aggregate to the |A| x |B| contingency
    * cells; marginals re-aggregate the cell table and meet in a
    * broadcast join — nothing row-sized survives the first exchange.
    */
  def agreementReport(
      df: DataFrame,
      colA: String,
      colB: String): DataFrame = {
    val cells = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("__a"),
        col(colB).cast("string").as("__b"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val ra = cells.groupBy(col("__a").as("__k"))
      .agg(sum(col("__c")).as("__ra"))
    val rb = cells.groupBy(col("__b").as("__k"))
      .agg(sum(col("__c")).as("__rb"))
    val tot = cells.agg(sum(col("__c")).as("__n"),
      sum(when(col("__a") === col("__b"), col("__c"))
        .otherwise(0.0)).as("__agree"))
    val pe = ra.join(rb, "__k")
      .crossJoin(broadcast(tot.select(col("__n").as("__n2"))))
      .agg(sum(col("__ra") * col("__rb") /
        (col("__n2") * col("__n2"))).as("pe"))
    tot.crossJoin(broadcast(pe))
      .select(col("__n").cast("long").as("n"),
        (col("__agree") / col("__n")).as("po"), col("pe"))
      .withColumn("kappa",
        when(col("pe") < 1.0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe"))))
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
