package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Every sample here
  * is a pure function of the row's id — reproducible across runs,
  * engines, and partitionings (unlike `df.sample`, whose output depends
  * on partition layout and RNG state), so sampled datasets can be audited
  * and re-derived.
  *
  * The hash is a 52-bit prefix of md5 — 52 bits so the value is exact in
  * a double and the identical expression is computable in any engine with
  * md5 (SQL-oracle-able, which xxhash64-based sampling is not).
  */
object Sampling {

  private val HashBits = 52
  val HashSpace: Long = 1L << HashBits // 2^52

  /** Uniform 52-bit hash in [0, 2^52) of the id's string form. */
  def md5Hash52(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, HashBits / 4), 16, 10)
      .cast("long")

  /** Map-only deterministic Bernoulli sample: keeps rows whose id hashes
    * under `fraction` of the hash space. No shuffle, no RNG state — the
    * same rows survive at any scale and partitioning.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(md5Hash52(col(idCol)) < (fraction * HashSpace).toLong)
  }

  /** Map-only deterministic WEIGHTED Bernoulli sample: each row's keep
    * probability is its own `weightCol` clamped to [0,1] (soft quality
    * filtering: keep a doc with probability equal to its quality score,
    * so marginal docs thin out instead of a hard threshold cliff). Same
    * md5-52-bit id hash as [[hashSample]] — deterministic, partition-
    * invariant, zero shuffle; a null weight drops the row.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String): DataFrame =
    df.filter(md5Hash52(col(idCol)) <
      (least(lit(1.0), greatest(lit(0.0), col(weightCol).cast("double")))
        * lit(HashSpace.toDouble)).cast("long"))

  /** Map-only deterministic STRATIFIED Bernoulli sample: a per-stratum
    * keep fraction (the "downsample web text, keep all books" rebalance).
    * Strata absent from `fractions` fall back to `default`. Same
    * md5-52-bit hash as [[hashSample]] — the same rows survive at any
    * scale and partitioning, and the fraction table rides the plan as a
    * literal map (no join, no shuffle, whole-stage codegen).
    */
  def stratifiedSample(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      fractions: Map[String, Double],
      default: Double = 0.0): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0 && f <= 1),
      "every fraction must be in [0,1]")
    val defaultCutoff = lit((default * HashSpace).toLong)
    val cutoff = if (fractions.isEmpty) defaultCutoff else {
      val thresholdMap = map(fractions.toSeq.flatMap { case (k, f) =>
        Seq(lit(k), lit((f * HashSpace).toLong)) }: _*)
      coalesce(element_at(thresholdMap, col(stratumCol).cast("string")),
        defaultCutoff)
    }
    df.filter(md5Hash52(col(idCol)) < cutoff)
  }

  /** Deterministic multi-way split (train/val/test): every row gets a
    * `split` label by id-hash range, proportional to `weights`
    * (normalized). Map-only, no shuffle; membership is a pure function of
    * the id, so splits are stable across runs, engines and scales, and
    * disjointness/coverage hold by construction. Labels are assigned in
    * lexicographic order for cross-engine reproducibility. Null ids have
    * no hash and are DROPPED, matching [[hashSample]] — otherwise they
    * would all silently land in the last label and skew its ratio.
    */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      weights: Map[String, Double]): DataFrame =
    df.filter(col(idCol).isNotNull)
      .withColumn("split", splitLabel(md5Hash52(col(idCol)), weights))

  /** The [[hashSplit]] label column over an arbitrary 52-bit hash:
    * labels in lexicographic order, cutoffs at the normalized
    * cumulative weights.
    */
  private def splitLabel(h: Column, weights: Map[String, Double]): Column = {
    require(weights.nonEmpty, "weights must not be empty")
    require(weights.values.forall(_ > 0), "every weight must be > 0")
    val total = weights.values.sum
    val cum = weights.toSeq.sortBy(_._1)
      .scanLeft(("", 0.0)) { case ((_, acc), (k, w)) => (k, acc + w / total) }
      .drop(1)
    cum.init.foldRight(lit(cum.last._1)) {
      case ((k, c), acc) => when(h < lit((c * HashSpace).toLong), k)
        .otherwise(acc)
    }
  }

  /** LEAKAGE-SAFE train/val/test split: near-duplicate documents must
    * never straddle a split boundary (a test doc whose near-copy sits
    * in train leaks the answer into evaluation), so membership hashes
    * the document's duplicate-COMPONENT representative instead of its
    * own id. `pairs` — any near-dup pair output
    * ([[Dedup.minHashLshPairs]], [[Media.pHashNearDups]],
    * [[Dedup.simHashNearDups]]) — collapses into connected components
    * ([[Dedup.connectedComponents]] star contraction); every member
    * splits by the component's min id, documents in no pair by their
    * own id — with empty `pairs` this IS [[hashSplit]], label for
    * label. Null ids drop ([[hashSplit]]'s convention). Output: the
    * input columns + `split`.
    *
    * Scale shape: component contraction runs over the PAIR set (the
    * near-dup output — orders of magnitude below the corpus); the
    * corpus pays one left join against the component map (AQE
    * broadcast-converts from its measured size) and the map-only hash
    * label. The component map stays persisted for this convenience
    * form; long-lived sessions should use
    * [[leakageSafeSplitReleasable]].
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      weights: Map[String, Double],
      idColA: String = "id_a",
      idColB: String = "id_b"): DataFrame =
    leakageSafeSplitReleasable(df, idCol, pairs, weights, idColA, idColB)._1

  /** [[leakageSafeSplit]] plus a release() thunk for the persisted
    * component map (call after the split output is consumed).
    */
  def leakageSafeSplitReleasable(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      weights: Map[String, Double],
      idColA: String = "id_a",
      idColB: String = "id_b"): (DataFrame, () => Unit) = {
    val (comp, release) =
      Dedup.connectedComponentsReleasable(pairs, idColA, idColB)
    val rep = coalesce(col("__comp"), col(idCol))
    val out = df.filter(col(idCol).isNotNull)
      .join(comp.select(col("id").as(idCol), col("comp").as("__comp")),
        Seq(idCol), "left")
      .withColumn("split", splitLabel(md5Hash52(rep), weights))
      .drop("__comp")
    (out, release)
  }

  /** Cap every group at `k` ORIGINAL rows (the "at most K docs per
    * domain" web-curation rule): survivors are the deterministic
    * [[bottomK]] sample of each group, fetched back by a semi-join, so
    * the full row payload survives while the op stays
    * partition-invariant. The bounded winner set (<= k rows per key)
    * joins with no hint — AQE broadcast-converts from measured size, so
    * a huge key space degrades to a shuffle join rather than an OOM.
    */
  def capPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      k: Int): DataFrame = {
    val winners = bottomK(df, keyCols, idCol, k).drop("rank")
    df.join(winners, keyCols :+ idCol, "left_semi")
      .select(df.columns.map(col).toIndexedSeq: _*) // original column order
  }

  /** Temperature-weighted source mixing — the standard multi-corpus
    * rebalance (sampling weights ∝ sizeᵗ): at t=1 sources keep their
    * natural proportions, as t→0 they approach uniform, so small
    * high-quality sources are up-weighted relative to bulk web text.
    *
    * Per-source keep rate: with n_s rows in source s and N total,
    * target_s = targetFraction · N · n_sᵗ / Σ n_uᵗ and
    * rate_s = min(1, target_s / n_s). Rows are kept by the same
    * deterministic md5-52-bit id-hash as [[hashSample]], so the selected
    * set is reproducible and partition-invariant. (Rates cap at 1 —
    * Bernoulli sampling cannot up-sample; a source whose target exceeds
    * its size keeps everything and the realized total lands below the
    * target, matching how mixing weights degrade in practice.)
    *
    * Scale shape: one map-side-combined count per source (source
    * cardinality is pipeline-bounded — dozens, not millions), a 1-row
    * global aggregate attached by broadcast cross join, and the
    * source→cutoff table joined back with no hint (AQE
    * broadcast-converts from measured size). The corpus itself takes no
    * shuffle — the filter is map-only.
    */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      targetFraction: Double,
      temperature: Double = 0.5): DataFrame = {
    require(targetFraction >= 0 && targetFraction <= 1,
      s"targetFraction must be in [0,1], got $targetFraction")
    require(temperature > 0 && temperature <= 1,
      s"temperature must be in (0,1], got $temperature")
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", pow(col("__n"), lit(temperature)))
    val totals = counts.agg(sum(col("__n")).as("__total"),
      sum(col("__w")).as("__wsum"))
    val cutoffs = counts.crossJoin(broadcast(totals))
      .select(col(sourceCol).as("__src"),
        (least(lit(1.0),
          lit(targetFraction) * col("__total") * col("__w")
            / (col("__wsum") * col("__n")))
          * lit(HashSpace.toDouble)).cast("long").as("__cutoff"))
    // null-safe join key: groupBy puts NULL-source rows in their own
    // stratum, and <=> matches them back to that stratum's cutoff — a
    // plain equi-join would silently drop every NULL-source row
    df.join(cutoffs, col(sourceCol) <=> col("__src"))
      .filter(md5Hash52(col(idCol)) < col("__cutoff"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Deterministic token-budget selection: lay the corpus out in id-hash
    * order (an unbiased, reproducible shuffle) and keep the prefix of
    * documents that fits entirely inside `budget` total tokens — the
    * "take a uniform 50B-token subset of the corpus" op.
    *
    * A document is kept iff its whole token count still fits
    * (cumulative-inclusive ≤ budget), so the selection never truncates a
    * document. Output is the original rows, original column order.
    *
    * Scale shape: the cumulative sum is [[Packing.packSequences]]'s
    * distributed prefix sum (range-repartition on the hash, per-partition
    * totals cumulated into exclusive offsets — NO global single-reducer
    * window), followed by a map-only filter and a semi-join back to the
    * source to fetch full rows (winner side bounded by the budget; AQE
    * picks the join strategy from measured size).
    */
  def tokenBudgetSelect(
      df: DataFrame,
      idCol: String,
      tokCol: String,
      budget: Long): DataFrame =
    tokenBudgetSelectReleasable(df, idCol, tokCol, budget)._1

  /** [[tokenBudgetSelect]] plus a release() thunk for the persisted
    * layout frame (same contract as [[Packing.packSequencesReleasable]]:
    * call release() once the returned plan has been materialized).
    */
  def tokenBudgetSelectReleasable(
      df: DataFrame,
      idCol: String,
      tokCol: String,
      budget: Long): (DataFrame, () => Unit) = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val (layout, release) = Packing.packSequencesReleasable(
      df.withColumn("__h", md5Hash52(col(idCol))),
      idCol, tokCol, "__h", math.max(budget, 1L))
    val winners = layout
      .filter(col("start_offset") + col("n_tokens") <= budget)
      .select(col(idCol))
    val out = df.join(winners, Seq(idCol), "left_semi")
      .select(df.columns.map(col).toIndexedSeq: _*)
    (out, release)
  }

  /** Per-group deterministic sample of `k` rows: the k smallest id-hashes
    * per group (a fixed-size uniform-without-replacement sample, stable
    * under reshuffling). Uses the bounded top-k aggregate, so each
    * partition contributes at most k rows per group to the shuffle — the
    * per-group sort/row_number formulation shuffles every row.
    *
    * Returns the group keys + (id, rank), rank 1..k by hash asc, id asc.
    */
  def bottomK(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      k: Int): DataFrame = {
    // topk_agg keeps score-DESC maxima; negate the hash for bottom-k
    val score = -md5Hash52(col(idCol)).cast("double")
    df.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.topk_agg(score, col(idCol), k).as("topk"))
      .select(keyCols.map(col) :+ posexplode(col("topk")).as(Seq("r", "t")): _*)
      .select(keyCols.map(col) ++ Seq(col("t.item_id").as(idCol),
        (col("r") + 1).as("rank")): _*)
  }

  /** Weighted sampling WITHOUT replacement, k per group — the
    * Efraimidis–Spirakis A-ES scheme with a deterministic draw: each
    * row scores exp_i = -ln(u_i) / w_i with u_i the row's md5-52-bit
    * id-hash mapped into (0, 1], and the k SMALLEST exponential draws
    * per group win (probability of selection proportional to weight,
    * exactly the A-ES guarantee). Fully deterministic and
    * partition-invariant; rows with weight <= 0 or null never win.
    *
    * Scale shape: identical to [[bottomK]] — a bounded map-side top-k
    * aggregate (k rows per partition per group reach the exchange), the
    * winners semi-join the source back for full rows.
    */
  def weightedBottomK(
      df: DataFrame,
      keyCols: Seq[String],
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (md5Hash52(col(idCol)).cast("double") + 1.0) / HashSpace.toDouble
    // topk_agg keeps maxima; the negated exponential draw ln(u)/w makes
    // "largest score" = "smallest -ln(u)/w draw"
    val score = when(col(weightCol).isNotNull && col(weightCol) > 0,
      log(u) / col(weightCol)).otherwise(lit(Double.NegativeInfinity))
    val winners = df.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.topk_agg(score, col(idCol), k).as("topk"))
      .select(keyCols.map(col) :+ posexplode(col("topk")).as(Seq("r", "t")): _*)
      .filter(!col("t.score").isin(Double.NegativeInfinity))
      .select(keyCols.map(col) ++ Seq(col("t.item_id").as(idCol)): _*)
    // Null-safe on the group keys: a NULL-key stratum wins the top-k
    // aggregate like any other group, so the semi-join back must match
    // it (<=>) — a plain equi-join would drop all its rows.
    val aliased = winners.select(
      (keyCols :+ idCol).map(c => col(c).as(s"__w_$c")): _*)
    val cond = (keyCols :+ idCol).map(c => col(c) <=> col(s"__w_$c"))
      .reduce(_ && _)
    df.join(aliased, cond, "left_semi")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** DoReMi-lite domain reweighting (after Xie et al., "DoReMi:
    * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    * arXiv:2305.10429): a fixed-iteration multiplicative-weights update
    * over per-domain excess loss. Full DoReMi retrains a proxy model
    * between updates; the lite form takes the per-example proxy and
    * reference losses as COLUMNS (computed by any upstream scorer —
    * perplexity, quality classifier, …) and runs the deterministic
    * minimax update on their per-domain means:
    *
    *   e_k        = mean over domain k of max(proxyLoss - refLoss, 0)
    *   a_k        = w_k * exp(eta * e_k)         (multiplicative step)
    *   w'_k       = (1-smoothing) * a_k / Σa  +  smoothing / K
    *
    * iterated `steps` times from the uniform mixture. The smoothing
    * remix each step is what makes iteration genuinely sequential (and
    * matches DoReMi's uniform-smoothed update, §3 step 2).
    *
    * Scale shape: ONE map-side-combinable aggregate over the corpus
    * produces K rows (K = training domains — tens, never data-scale);
    * the iteration is driver-side arithmetic on K doubles. Returns
    * (domain, excess, weight), weights summing to 1.
    */
  def doremiWeights(
      df: DataFrame,
      domainCol: String,
      proxyLossCol: String,
      refLossCol: String,
      eta: Double = 1.0,
      steps: Int = 10,
      smoothing: Double = 0.1): DataFrame = {
    require(eta > 0, s"eta must be > 0, got $eta")
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(smoothing >= 0 && smoothing < 1,
      s"smoothing must be in [0,1), got $smoothing")
    val spark = df.sparkSession
    // bounded collect: K rows, K = distinct domains of a training mixture
    val ex = df.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(avg(greatest(col(proxyLossCol) - col(refLossCol), lit(0.0)))
        .as("excess"))
      .orderBy(col("domain"))
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0),
        r.getDouble(1)))
    val k = ex.length
    require(k >= 1, "doremiWeights needs at least one domain")
    val e = ex.map(_._2)
    var w = Array.fill(k)(1.0 / k)
    var step = 0
    while (step < steps) {
      val a = Array.tabulate(k)(j => w(j) * math.exp(eta * e(j)))
      val z = a.sum
      w = a.map(x => (1 - smoothing) * x / z + smoothing / k)
      step += 1
    }
    import spark.implicits._
    ex.zip(w).map { case ((d, exc), wt) => (d, exc, wt) }
      .toSeq.toDF("domain", "excess", "weight")
  }

  /** Resample a corpus toward a TARGET domain mixture: given per-domain
    * weights (e.g. [[doremiWeights]] output — weights summing to 1),
    * keep each domain at the deterministic id-hash rate
    *
    *   rate_k = min(1, targetFraction * N_total * w_k / n_k)
    *
    * so the survivors approximate `targetFraction * N_total` rows
    * distributed as the weights. Rates cap at 1 — a domain cannot be
    * oversampled without replication, the standard mixture-sampler
    * behavior — and domains absent from `weights` are dropped (weight
    * 0). This is [[temperatureMix]] with the size^T weight replaced by
    * an externally-supplied target, closing the DoReMi loop:
    * weights out of the solver, resampled corpus out of this.
    *
    * Scale shape: ONE count aggregate (K rows), weights broadcast into
    * the cutoff join; the corpus-side filter is map-only — no corpus
    * shuffle.
    */
  def applyMixtureWeights(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      weights: DataFrame,
      targetFraction: Double,
      weightDomainCol: String = "domain",
      weightCol: String = "weight"): DataFrame = {
    require(targetFraction >= 0 && targetFraction <= 1,
      s"targetFraction must be in [0,1], got $targetFraction")
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("__n"))
    val totals = counts.agg(sum(col("__n")).as("__total"))
    val wNorm = weights.select(
      col(weightDomainCol).cast("string").as("__d"),
      col(weightCol).cast("double").as("__w"))
    val cutoffs = counts.crossJoin(broadcast(totals))
      .join(broadcast(wNorm), col(domainCol).cast("string") <=> col("__d"))
      .select(col(domainCol).as("__src"),
        (least(lit(1.0),
          lit(targetFraction) * col("__total") * col("__w") / col("__n"))
          * lit(HashSpace.toDouble)).cast("long").as("__cutoff"))
    // null-safe join key: a NULL-domain stratum matches its cutoff row.
    // The cutoff table is K rows — broadcast it EXPLICITLY so the
    // corpus is always the streamed side (on a tiny test corpus AQE
    // would otherwise happily broadcast the corpus instead, a shape
    // that cannot scale past executor memory).
    df.join(broadcast(cutoffs), col(domainCol) <=> col("__src"))
      .filter(md5Hash52(col(idCol)) < col("__cutoff"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Deterministic source-interleaved ordering key for training-data
    * writes: each row gets `interleave_rank` — its md5-hash position
    * WITHIN its source — so that sorting by (interleave_rank, source)
    * round-robins proportionally across sources (every source's k-th
    * row appears before any source's (k+1)-th), the "balanced shuffle"
    * a curriculum-stable dataloader wants, reproducible on replay.
    *
    * One hash exchange on the source + a per-source sort; no global
    * ordering is materialized here — writers range-partition on
    * (interleave_rank, source) (e.g. `orderBy` into
    * [[graft.io.ShardWriter]]) so the global order exists on disk
    * without a single-partition bottleneck.
    */
  def interleaveSources(
      df: DataFrame,
      sourceCol: String,
      idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(md5Hash52(col(idCol)).asc, col(idCol).asc)
    df.filter(col(sourceCol).isNotNull)
      .withColumn("interleave_rank", row_number().over(w).cast("long"))
  }

  /** Deterministic NEGATIVE sampling for contrastive training: `k`
    * pseudo-random partner ids per anchor, drawn as
    * md5(anchor ':' j) (52-bit) mod N over a DENSE integer id domain
    * [0, N) — the caller's corpus must carry such ids (write one with
    * [[graft.io.ShardWriter]] or a row-number pass if it doesn't). A
    * draw that lands on the anchor itself advances by 1 mod N, so no
    * anchor is ever its own negative. Repeats across j are possible
    * and standard (sampling WITH replacement).
    *
    * Zero shuffle and zero RNG state: the domain size attaches as a
    * broadcast 1-row cross join and every draw is a row-local md5 —
    * the same pairs come out at any scale, partitioning, or engine
    * (the formula is exactly SQL-expressible, so draws are
    * oracle-checkable). Output: anchor_id, j, neg_id.
    */
  def negativeSamples(
      df: DataFrame,
      idCol: String,
      k: Int,
      domain: DataFrame): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val n = domain.agg(count(lit(1)).as("__n"))
    df.select(col(idCol).as("anchor_id"))
      .crossJoin(broadcast(n))
      .select(col("anchor_id"), col("__n"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col("anchor_id"), col("j").cast("long").as("j"),
        (md5Hash52(concat(col("anchor_id").cast("string"), lit(":"),
          col("j").cast("string"))) % col("__n")).as("__raw"),
        col("__n"))
      .select(col("anchor_id"), col("j"),
        when(col("__raw") === col("anchor_id"),
          (col("__raw") + 1) % col("__n"))
          .otherwise(col("__raw")).as("neg_id"))
  }
}
