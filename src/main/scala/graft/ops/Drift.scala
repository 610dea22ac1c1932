package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distribution-drift metrics between two statistical profiles — the
  * monitoring computation a profile store exists for: compare this
  * window's column distribution against a reference window's WITHOUT
  * rescanning either dataset, using only the profiles' KLL sketches.
  *
  * Bins are caller-fixed edges (bin i = (e_{i-1}, e_i], open at the
  * ends); per-bin probabilities come from the sketches' INCLUSIVE
  * normalized ranks ([[graft.functions.kll_rank]]) — exact below sketch
  * capacity, rank-error-bounded above it. Fixed edges (rather than
  * per-run min/max bins) keep the two sides and any SQL oracle on
  * identical boundaries.
  *
  * Everything is a scalar expression over sketch bytes: drift for every
  * (group x column) pair computes in one map pass over stored profiles.
  */
object Drift {

  private def binProbs(sk: Column, edges: Seq[Double], eps: Double): Seq[Column] = {
    val ranks = edges.map(e => graft.functions.kll_rank(sk, lit(e)))
    val lo = lit(0.0) +: ranks
    val hi = ranks :+ lit(1.0)
    // eps floor keeps empty bins from collapsing the log terms
    lo.zip(hi).map { case (l, h) => greatest(h - l, lit(eps)) }
  }

  /** Population Stability Index: sum_i (p_i - q_i) * ln(p_i / q_i).
    * Common gates: < 0.1 stable, 0.1-0.25 moderate, > 0.25 shifted.
    */
  def psi(a: Column, b: Column, edges: Seq[Double],
      eps: Double = 1e-6): Column =
    binProbs(a, edges, eps).zip(binProbs(b, edges, eps))
      .map { case (p, q) => (p - q) * log(p / q) }
      .reduce(_ + _)

  /** Jensen–Shannon divergence over the same fixed bins (natural log;
    * bounded by ln 2): jsd = (KL(p||m) + KL(q||m)) / 2 with
    * m = (p+q)/2 — the symmetric, always-finite companion to [[psi]]
    * for dashboards that need a bounded score.
    */
  def jsd(a: Column, b: Column, edges: Seq[Double],
      eps: Double = 1e-6): Column =
    binProbs(a, edges, eps).zip(binProbs(b, edges, eps))
      .map { case (p, q) =>
        val m = (p + q) / 2
        (p * log(p / m) + q * log(q / m)) * lit(0.5)
      }
      .reduce(_ + _)

  /** Kolmogorov–Smirnov statistic over a fixed edge grid: the maximum
    * |CDF_a(e) - CDF_b(e)| across the supplied edges, with each CDF read
    * from its KLL sketch's inclusive normalized rank
    * ([[graft.functions.kll_rank]]) — exact below sketch capacity,
    * rank-error-bounded above it. The grid statistic lower-bounds the
    * continuous sup over all thresholds; a denser grid tightens it (the
    * classical use gates on fixed critical values, so a fixed grid keeps
    * both engines and any SQL oracle on identical thresholds). Scalar
    * expression over sketch bytes, like [[psi]]/[[jsd]]: one map pass
    * over stored profiles, no raw rescan.
    */
  def ks(a: Column, b: Column, edges: Seq[Double]): Column = {
    require(edges.nonEmpty, "ks requires at least one edge")
    edges.map(e => abs(graft.functions.kll_rank(a, lit(e)) -
        graft.functions.kll_rank(b, lit(e))))
      .reduce((x, y) => greatest(x, y))
  }

  /** Earth-mover's (Wasserstein-1) distance between two KLL sketch
    * columns over a fixed edge grid — the fourth member of the
    * numeric drift set ([[psi]] is bin-ratio-sensitive, [[jsd]]
    * bounded, [[ks]] a max gap; EMD alone reports HOW FAR the mass
    * moved, in the value column's own units):
    * sum over grid cells of |CDF_a(e_i) - CDF_b(e_i)| x cell width.
    * Exact-below-capacity like [[ks]] (grid-resolution-bounded above),
    * and the same per-group, from-stored-profiles usability — a pure
    * scalar expression over two sketches, no join, no shuffle.
    */
  def emd(a: Column, b: Column, edges: Seq[Double]): Column = {
    require(edges.size >= 2, "emd requires at least two edges")
    require(edges == edges.sorted, "emd edges must be ascending")
    edges.init.zip(edges.tail).map { case (lo, hi) =>
      abs(graft.functions.kll_rank(a, lit(lo)) -
        graft.functions.kll_rank(b, lit(lo))) * lit(hi - lo)
    }.reduce(_ + _)
  }

  /** CATEGORICAL drift: PSI over category shares read from two
    * frequent-items sketches ([[graft.functions.freq_items_agg]]) — the
    * string-column companion to the numeric [[psi]], computable from
    * stored profiles alone. Shares come from sketch estimates over the
    * UNION of both sides' tracked items, eps-floored so one-sided
    * categories contribute a finite term.
    *
    * EXACT below sketch capacity (distinct values <= maxMapSize: the
    * items sketch holds true counts, so shares — and the PSI — are
    * exact and SQL-oracle-able). Above capacity, shares are
    * heavy-hitter estimates and the PSI is an approximation over the
    * tracked heads.
    *
    * A pure scalar expression (nested codegen HOFs over the <= k-item
    * arrays): categorical drift for every (group x column) computes in
    * one map pass over profile rows — no join, no shuffle, usable per
    * group like every other drift metric here.
    */
  def categoricalPsi(a: Column, b: Column, k: Int = 128,
      eps: Double = 1e-6): Column =
    categoricalTerms(a, b, k, eps) { (pa, pb) =>
      (pa - pb) * log(pa / pb)
    }

  /** Categorical Jensen–Shannon divergence over the same sketch-derived
    * shares ([[jsd]]'s formula, [[categoricalPsi]]'s share machinery).
    */
  def categoricalJsd(a: Column, b: Column, k: Int = 128,
      eps: Double = 1e-6): Column =
    categoricalTerms(a, b, k, eps) { (pa, pb) =>
      val m = (pa + pb) / 2
      (pa * log(pa / m) + pb * log(pb / m)) * lit(0.5)
    }

  /** Categorical total-variation distance over the same sketch-derived
    * shares — max |P(S) - Q(S)| over all category sets, in [0, 1]: the
    * categorical analogue of [[emd]]'s "how much mass moved" (PSI and
    * JSD weight by log ratios; TVD is the plain fraction of shifted
    * mass, and the metric [[graft.ops.Privacy.tClosenessReport]]
    * thresholds per group — here as a two-sketch drift column).
    */
  def categoricalTvd(a: Column, b: Column, k: Int = 128,
      eps: Double = 1e-6): Column =
    categoricalTerms(a, b, k, eps) { (pa, pb) =>
      abs(pa - pb) / 2
    }

  /** Shared share machinery for the categorical divergences: eps-floored
    * shares over the sorted union of both sketches' tracked items,
    * summed through `term` in deterministic (item-name) order.
    */
  private def categoricalTerms(a: Column, b: Column, k: Int, eps: Double)(
      term: (Column, Column) => Column): Column = {
    val ia = graft.functions.freq_items_topk(a, lit(k))
    val ib = graft.functions.freq_items_topk(b, lit(k))
    def total(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, x) => acc + x.getField("estimate"))
        .cast("double")
    def est(arr: Column, item: Column): Column =
      // get() (not element_at) tolerates a missing item under ANSI mode
      coalesce(get(filter(arr,
        y => y.getField("item") === item), lit(0)).getField("estimate"),
        lit(0L)).cast("double")
    val ta = total(ia)
    val tb = total(ib)
    val names = array_sort(array_union(
      transform(ia, x => x.getField("item")),
      transform(ib, x => x.getField("item"))))
    aggregate(names, lit(0.0), (acc, it) => {
      val pa = greatest(est(ia, it) / ta, lit(eps))
      val pb = greatest(est(ib, it) / tb, lit(eps))
      acc + term(pa, pb)
    })
  }

  /** Total stream count tracked by a frequent-items sketch (sum of item
    * estimates — exact below sketch capacity).
    */
  def categoricalTotal(sk: Column, k: Int = 128): Column =
    aggregate(graft.functions.freq_items_topk(sk, lit(k)), lit(0L),
      (acc, x) => acc + x.getField("estimate"))

  /** SCHEMA drift between two stored dataset profiles (each a single
    * global profile row): per column, presence on each side, inferred
    * type and whether it changed, null fraction and its delta, and the
    * distinct-count estimate — the "did the pipeline upstream change
    * shape" report a profile store answers without touching raw data.
    *
    * Shape: one explode per side over the per-column structs (constant
    * plan size at any width), then a full-outer join of two
    * columns-sized frames — trivially broadcastable. Output: column,
    * present_a/b (int), type_a/b, type_changed (int; 0 when either side
    * is absent), null_frac_a/b, null_frac_delta, card_a/b (rounded
    * distinct estimates).
    */
  def schemaDrift(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    def profCols(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.schema.fields.filter(f =>
        graft.profile.ProfileSchema.isProfileType(f.dataType))
        .map(_.name).toSeq
    def entries(df: org.apache.spark.sql.DataFrame,
        side: String): org.apache.spark.sql.DataFrame = {
      val cols = profCols(df)
      require(cols.nonEmpty, s"schemaDrift: side $side has no profile columns")
      // a grouped (multi-row) profile frame would silently multiply the
      // per-column rows through the full-outer join — fail loudly like
      // autoEdges does (profile frames are tiny; the count is cheap)
      require(df.limit(2).count() == 1,
        s"schemaDrift: side $side must hold exactly ONE global profile " +
          "row — merge grouped profiles down first (mergeProfiles)")
      // backtick the profile column segment: flattened nested leaves
      // carry dots ("arr.size") that col() would walk as a field path
      df.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col(s"`$c`.inferred_type").as(s"type_$side"),
        when(col(s"`$c`.count") > 0,
          col(s"`$c`.null_count").cast("double") / col(s"`$c`.count"))
          .otherwise(lit(0.0)).as(s"null_frac_$side"),
        round(col(s"`$c`.cardinality.estimate")).cast("long")
          .as(s"card_$side"))): _*)).as("e"))
        .select(col("e.*"))
        .withColumn(s"present_$side", lit(1))
    }
    entries(a, "a").join(entries(b, "b"), Seq("column"), "full_outer")
      .select(col("column"),
        coalesce(col("present_a"), lit(0)).as("present_a"),
        coalesce(col("present_b"), lit(0)).as("present_b"),
        col("type_a"), col("type_b"),
        coalesce(col("type_a").isNotNull && col("type_b").isNotNull &&
          col("type_a") =!= col("type_b"), lit(false)).cast("int")
          .as("type_changed"),
        col("null_frac_a"), col("null_frac_b"),
        when(col("null_frac_a").isNotNull && col("null_frac_b").isNotNull,
          col("null_frac_b") - col("null_frac_a")).as("null_frac_delta"),
        col("card_a"), col("card_b"))
  }

  /** Bin edges for [[psi]]/[[klDivergence]] DERIVED from a reference
    * profile's KLL sketch: the sketch's quantiles at `probs` (default
    * quartiles), so drift bins adapt to the observed distribution
    * instead of hand-picked constants — equal-mass bins maximize PSI
    * sensitivity. One bounded 1-row driver action against the reference
    * frame (which must hold exactly one profile row); duplicate
    * quantile values (heavy point masses) collapse to keep bins
    * well-formed.
    */
  def autoEdges(
      reference: org.apache.spark.sql.DataFrame,
      sketchCol: String,
      probs: Seq[Double] = Seq(0.25, 0.5, 0.75)): Seq[Double] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      s"probs must be in [0,1], got $probs")
    val rows = reference.select(probs.map(p =>
      graft.functions.kll_quantile(col(sketchCol), lit(p))): _*).head(2)
    require(rows.length == 1,
      s"autoEdges needs exactly ONE reference row, got ${rows.length} — " +
        "merge the reference down first")
    // getDouble on a NULL cell coerces to 0.0 silently (primitive null
    // coercion) — an empty/null reference sketch must fail loudly, not
    // hand back identical bogus edges.
    probs.indices.foreach { i =>
      require(!rows.head.isNullAt(i),
        s"autoEdges: reference sketch '$sketchCol' has no quantile at " +
          s"p=${probs(i)} (empty or null sketch) — profile the " +
          "reference data first")
    }
    probs.indices.map(rows.head.getDouble).distinct.sorted
  }

  /** Metric-anomaly screen over a profile TIME SERIES: given many
    * profile rows (one per window/segment), z-score each window's MEAN
    * of every listed column against the distribution of that metric
    * across ALL windows — the "which week looks wrong" question a
    * profile store answers without touching raw data. Output: keep
    * columns + (column, metric_mean, z, is_anomaly per `threshold`).
    *
    * Shape: one explode over per-column structs (constant plan size at
    * any width, the [[profileDrift]] pattern), a tiny per-column
    * aggregate over the WINDOW rows (windows x columns, not data rows),
    * broadcast back, pure projection. Windows with a null mean (empty
    * numeric state) drop out. Degenerate spread (stddev 0 or a single
    * window) z-scores to 0 — never NaN.
    */
  def metricAnomalies(
      profiles: org.apache.spark.sql.DataFrame,
      cols: Seq[String],
      keep: Seq[String] = Nil,
      threshold: Double = 3.0): org.apache.spark.sql.DataFrame = {
    require(cols.nonEmpty, "metricAnomalies needs at least one column")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val entries = array(cols.map(c => struct(
      lit(c).as("column"),
      col(s"$c.numbers.mean").as("metric_mean"))): _*)
    val exploded = profiles
      .select(keep.map(col) :+ explode(entries).as("e"): _*)
      .select(keep.map(col) ++ Seq(col("e.column").as("column"),
        col("e.metric_mean").as("metric_mean")): _*)
      .filter(col("metric_mean").isNotNull)
    val stats = exploded.groupBy(col("column"))
      .agg(avg(col("metric_mean")).as("__mu"),
        stddev_samp(col("metric_mean")).as("__sd"))
    val z = when(col("__sd").isNotNull && col("__sd") > 0,
      (col("metric_mean") - col("__mu")) / col("__sd"))
      .otherwise(lit(0.0))
    exploded.join(broadcast(stats), Seq("column"))
      .select(keep.map(col) ++ Seq(col("column"), col("metric_mean"),
        z.as("z"), (abs(z) >= threshold).as("is_anomaly")): _*)
  }

  /** KL(a || b) over the same fixed bins. */
  def klDivergence(a: Column, b: Column, edges: Seq[Double],
      eps: Double = 1e-6): Column =
    binProbs(a, edges, eps).zip(binProbs(b, edges, eps))
      .map { case (p, q) => p * log(p / q) }
      .reduce(_ + _)

  /** Drift of EVERY profile row against one fixed reference profile: the
    * reference's sketch bytes embed as literals, so the result is a pure
    * map over the profile frame — no join, no shuffle, and it runs
    * unchanged on a Structured Streaming profile frame (per-window drift
    * as windows close: a continuous drift monitor).
    *
    * `keep` carries identifying columns (group keys, window) through.
    * Output: keep columns + one `<col>_psi` per entry in `edges`.
    */
  def againstReference(
      profiles: org.apache.spark.sql.DataFrame,
      reference: org.apache.spark.sql.DataFrame,
      edges: Map[String, Seq[Double]],
      keep: Seq[String] = Nil,
      eps: Double = 1e-6): org.apache.spark.sql.DataFrame = {
    val columns = edges.keys.toSeq.sorted
    val refRows = reference
      .select(columns.map(c => col(s"$c.numbers.kll")): _*).head(2)
    require(refRows.length == 1,
      s"againstReference needs exactly ONE reference profile row, got " +
        s"${if (refRows.isEmpty) "an empty frame" else "several rows"} — " +
        "merge the reference down first (ProfileSession.mergeProfiles)")
    val refRow = refRows.head
    val psiCols = columns.zipWithIndex.map { case (c, i) =>
      psi(col(s"$c.numbers.kll"), lit(refRow.getAs[Array[Byte]](i)),
        edges(c), eps).as(s"${c}_psi")
    }
    profiles.select(keep.map(col) ++ psiCols: _*)
  }

  /** [[binProbs]] with the edges as an array COLUMN instead of plan-time
    * literals — lets one plan node serve every column of a wide profile.
    * Ranks come from [[graft.functions.kll_rank]] applied per element
    * inside a `transform` lambda; the prob floor and log terms are
    * built-in array HOFs.
    */
  private def binProbsDyn(sk: Column, edgesCol: Column, eps: Double): Column = {
    val ranks = transform(edgesCol, e => graft.functions.kll_rank(sk, e))
    val lo = concat(array(lit(0.0)), ranks)
    val hi = concat(ranks, array(lit(1.0)))
    zip_with(hi, lo, (h, l) => greatest(h - l, lit(eps)))
  }

  /** Per-column drift report between two single-row profile frames (e.g.
    * this window's `aggProfiles()` output vs a stored reference window):
    * one row per requested column with (psi, kl), computed ONLY from the
    * profiles' stored KLL bytes (`<col>.numbers.kll`) — no access to
    * either window's raw data.
    *
    * SINGLE-PASS over columns: one explode over an array of
    * (column, sk_a, sk_b, edges) structs — plan size is constant in the
    * number of profiled columns (a 1000-column profile is one array
    * literal, not 1000 unioned subplans paying analyzer cost each).
    */
  def profileDrift(
      current: org.apache.spark.sql.DataFrame,
      reference: org.apache.spark.sql.DataFrame,
      edges: Map[String, Seq[Double]],
      eps: Double = 1e-6): org.apache.spark.sql.DataFrame = {
    val columns = edges.keys.toSeq.sorted
    val a = current.select(columns.map(c =>
      col(s"$c.numbers.kll").as(s"__a_$c")): _*)
    val b = reference.select(columns.map(c =>
      col(s"$c.numbers.kll").as(s"__b_$c")): _*)
    val entries = array(columns.map(c => struct(
      lit(c).as("column"),
      col(s"__a_$c").as("sk_a"),
      col(s"__b_$c").as("sk_b"),
      array(edges(c).map(lit): _*).as("edges"))): _*)
    val exploded = a.crossJoin(b).select(explode(entries).as("e"))
      .select(col("e.column").as("column"), col("e.sk_a").as("sk_a"),
        col("e.sk_b").as("sk_b"), col("e.edges").as("edges"))
    val pA = binProbsDyn(col("sk_a"), col("edges"), eps)
    val pB = binProbsDyn(col("sk_b"), col("edges"), eps)
    def sumArr(c: Column): Column = aggregate(c, lit(0.0), (acc, x) => acc + x)
    exploded.select(col("column"),
      sumArr(zip_with(pA, pB, (p, q) => (p - q) * log(p / q))).as("psi"),
      sumArr(zip_with(pA, pB, (p, q) => p * log(p / q))).as("kl"))
  }

  private def embMeanStats(
      df: org.apache.spark.sql.DataFrame,
      embCol: String,
      suffix: String): org.apache.spark.sql.DataFrame = {
    val e = col(embCol).cast("array<double>")
    df.filter(col(embCol).isNotNull).agg(
      graft.functions.vec_sum(e).as(s"__s$suffix"),
      count(lit(1)).as(s"__n$suffix"),
      sum(sqrt(graft.functions.vec_dot(e, e))).as(s"__ns$suffix"))
  }

  /** Embedding-distribution drift between two frames of vectors — the
    * embedding-space analogue of [[psi]]: did the representation of the
    * corpus move? Each side reduces in ONE map-side-combined aggregate
    * (vector sum + count + summed L2 norm — a dim-length buffer per
    * partition, never a vector shuffle); the two 1-row results meet in
    * a broadcast cross join and every metric is scalar array math.
    *
    * One row: n_cur, n_ref, mean_cosine (cosine between the two mean
    * vectors; 1.0 = no directional shift), mean_l2_shift (L2 distance
    * between means), norm_mean_cur / norm_mean_ref (average row L2
    * norms — catches scale drift that direction metrics miss).
    * Degenerate sides (empty, or a zero mean vector) yield NULL
    * mean_cosine rather than NaN.
    */
  def embeddingDrift(
      current: org.apache.spark.sql.DataFrame,
      reference: org.apache.spark.sql.DataFrame,
      embCol: String): org.apache.spark.sql.DataFrame = {
    val a = embMeanStats(current, embCol, "a")
    val b = embMeanStats(reference, embCol, "b")
    val meanA = transform(col("__sa"), x => x / col("__na"))
    val meanB = transform(col("__sb"), x => x / col("__nb"))
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val cosDen = sqrt(dot(meanA, meanA)) * sqrt(dot(meanB, meanB))
    a.crossJoin(broadcast(b)).select(
      col("__na").as("n_cur"),
      col("__nb").as("n_ref"),
      when(cosDen > 0, dot(meanA, meanB) / cosDen).as("mean_cosine"),
      sqrt(dot(zip_with(meanA, meanB, (p, q) => p - q),
        zip_with(meanA, meanB, (p, q) => p - q))).as("mean_l2_shift"),
      (col("__nsa") / col("__na")).as("norm_mean_cur"),
      (col("__nsb") / col("__nb")).as("norm_mean_ref"))
  }

  /** Per-dimension companion to [[embeddingDrift]]: one row per
    * embedding dimension with the two means and the absolute shift —
    * WHERE the representation moved, for drill-down after the summary
    * trips. Same single-aggregate-per-side shape; the explode runs over
    * one dim-length row.
    */
  def embeddingDriftByDim(
      current: org.apache.spark.sql.DataFrame,
      reference: org.apache.spark.sql.DataFrame,
      embCol: String): org.apache.spark.sql.DataFrame = {
    val a = embMeanStats(current, embCol, "a")
    val b = embMeanStats(reference, embCol, "b")
    val meanA = transform(col("__sa"), x => x / col("__na"))
    val meanB = transform(col("__sb"), x => x / col("__nb"))
    a.crossJoin(broadcast(b))
      .select(posexplode(zip_with(meanA, meanB,
        (p, q) => struct(p.as("ma"), q.as("mb")))).as(Seq("dim", "m")))
      .select(col("dim").cast("long").as("dim"),
        col("m.ma").as("mean_cur"), col("m.mb").as("mean_ref"),
        abs(col("m.ma") - col("m.mb")).as("shift"))
  }

  /** Tabular CUSUM change-point screen over metric time series: per
    * series (the `groupCols` key), values standardize against the
    * series' own mean/stddev, then the classic one-sided cumulative
    * sums accumulate with slack `k` and alarm at threshold `h`
    * (Page 1954 — the standard "did this metric's level shift"
    * monitor, more sensitive to small persistent shifts than the
    * z-score screen in [[metricAnomalies]]).
    *
    * The recursion s+_i = max(0, s+_{i-1} + z_i - k) is computed in
    * CLOSED FORM as running-sum minus running-min (s+ = S_i - min(0,
    * min_j S_j) over S = cumsum(z - k); s- symmetrically on -z), so
    * the whole screen is ONE hash exchange on the series key + one
    * sort — four window passes share the partition, no recursion, no
    * driver loop. Degenerate series (stddev 0 or one point) z-score
    * to 0 and never alarm.
    *
    * Output: groupCols..., orderCol, value, z, cusum_pos, cusum_neg,
    * alarm.
    */
  def cusum(
      df: org.apache.spark.sql.DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      valueCol: String,
      k: Double = 0.5,
      h: Double = 4.0): org.apache.spark.sql.DataFrame = {
    require(k >= 0, s"slack k must be >= 0, got $k")
    require(h > 0, s"threshold h must be > 0, got $h")
    val gcols = groupCols.map(col)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*)
      .orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*)
      .orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val v = col(valueCol).cast("double")
    val withZ = df
      .withColumn("__mu", avg(v).over(wAll))
      .withColumn("__sd", stddev_samp(v).over(wAll))
      .withColumn("z",
        when(col("__sd").isNull || col("__sd") === 0, lit(0.0))
          .otherwise((v - col("__mu")) / col("__sd")))
    withZ
      // running sums materialize first: a window function can't nest
      // inside another window's argument
      .withColumn("__sp", sum(col("z") - k).over(wRun))
      .withColumn("__sn", sum(-col("z") - k).over(wRun))
      .withColumn("cusum_pos",
        col("__sp") - least(lit(0.0), min(col("__sp")).over(wRun)))
      .withColumn("cusum_neg",
        col("__sn") - least(lit(0.0), min(col("__sn")).over(wRun)))
      .withColumn("alarm",
        col("cusum_pos") > h || col("cusum_neg") > h)
      .select(gcols ++ Seq(col(orderCol), v.as("value"), col("z"),
        col("cusum_pos"), col("cusum_neg"), col("alarm")): _*)
  }

  /** Pairwise distribution-drift matrix across ALL groups of a column —
    * "which sources disagree about this feature" in one shot, the
    * matrix generalization of [[psi]]'s two-cohort form. The corpus
    * reduces to ONE sketch per group in a single map-side-combined
    * aggregate; the K-row sketch table then self-joins (a < b, both
    * sides broadcast-sized since K = group count) and PSI + JSD read
    * straight off the sketch pairs over the fixed `edges` grid — raw
    * rows are scanned exactly once regardless of how many pairs the
    * matrix has. Exact below sketch capacity, rank-error-bounded above.
    *
    * Output: group_a, group_b (group_a < group_b lexicographically),
    * n_a, n_b, psi, jsd, ks (the [[ks]] grid statistic over the same
    * edges — the bounded, bin-free companion score).
    *
    * The per-group sketch table stays persisted until the session
    * drops it; monitors computing many matrices per session should use
    * [[psiMatrixReleasable]] and release after materializing.
    */
  def psiMatrix(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      valueCol: String,
      edges: Seq[Double],
      eps: Double = 1e-6): org.apache.spark.sql.DataFrame =
    psiMatrixReleasable(df, groupCol, valueCol, edges, eps)._1

  /** [[psiMatrix]] plus a release() thunk for the cached K-row sketch
    * table (both self-join sides read it, so without the cache the
    * corpus would be scanned and aggregated twice — the cache holds K
    * sketch rows, not data).
    */
  def psiMatrixReleasable(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      valueCol: String,
      edges: Seq[Double],
      eps: Double = 1e-6)
      : (org.apache.spark.sql.DataFrame, () => Unit) = {
    require(edges.nonEmpty, "psiMatrix requires at least one edge")
    val sk = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(graft.functions.kll_agg(col(valueCol).cast("double")).as("__sk"),
        count(col(valueCol)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = sk.select(col("__g").as("group_a"), col("__sk").as("__ska"),
      col("__n").as("n_a"))
    val b = sk.select(col("__g").as("group_b"), col("__sk").as("__skb"),
      col("__n").as("n_b"))
    val out = a.join(broadcast(b), col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        psi(col("__ska"), col("__skb"), edges, eps).as("psi"),
        jsd(col("__ska"), col("__skb"), edges, eps).as("jsd"),
        ks(col("__ska"), col("__skb"), edges).as("ks"))
    (out, () => { sk.unpersist(blocking = false); () })
  }
}
