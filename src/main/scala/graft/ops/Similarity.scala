package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{top_centroids, topk_agg, vec_sum}

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>` / `array<double>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast;
  *    the corpus streams through one codegen'd scoring stage into a
  *    map-side bounded top-k aggregate — the corpus never shuffles, and
  *    the only exchange carries <= partitions x queries x k rows.
  *  - [[ivfTopK]]: IVF-style pruning — corpus rows are assigned to their
  *    nearest centroid by a single-pass expression over a driver-side
  *    centroid literal (zero shuffle, zero join); a query scans only its
  *    nProbe closest inverted lists.
  * Plus random-hyperplane LSH planes used by [[Dedup.embeddingNearDups]].
  */
object Similarity {

  /** Elementwise dot product of two array columns, computed in double with
    * left-to-right accumulation (deterministic, matches a sequential SQL
    * evaluation of the same expression). Backed by the codegen'd
    * [[graft.functions.VecDot]] expression.
    */
  def dot(a: Column, b: Column): Column = graft.functions.vec_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(0.0)
  }

  /** L2-normalize an embedding (zero vectors pass through unchanged).
    * Normalized corpora turn cosine into a plain dot product — one fused
    * multiply-add loop instead of three — and make IVF/LSH bucket
    * geometry scale-invariant. Map-only, codegen'd (array Cast + VecDot).
    */
  /** Johnson–Lindenstrauss random projection with a DETERMINISTIC
    * hash-derived ±1 sign matrix (Achlioptas 2003's database-friendly
    * variant): out_k = (1/sqrt(dOut)) * sum_j emb_j * s(j, k), where
    * s(j, k) = ±1 from an integer hash of (j, k, seed) — no stored
    * matrix, identical on every executor and reproducible in plain SQL.
    * The standard pre-LSH / pre-clustering dimensionality reducer:
    * pairwise distances are preserved within (1 ± eps) at
    * dOut = O(log n / eps^2).
    *
    * Row-local codegen HOFs (dOut x d multiply-adds per row), zero
    * shuffle at any corpus size.
    */
  def randomProject(emb: Column, dOut: Int, seed: Long = 0L): Column = {
    require(dOut >= 1, s"dOut must be >= 1, got $dOut")
    // Sign hash: mix (j, k, seed) linearly, reduce mod M, THEN multiply
    // and reduce again before taking parity. The multiply must come
    // after the mix: parity of (j*A + k*B) mod M decomposes into
    // parity(j-term) XOR parity(k) whenever k*B stays far below M,
    // which makes every output dimension +-the same sum (a rank-1 sign
    // matrix — not a projection at all). The seed is reduced to
    // [0, M) driver-side (floorMod, so negative Longs map in too);
    // with all terms non-negative, j*1000003 + k + s stays below 2^62
    // for any embedding width, `%` never yields a negative remainder,
    // and the whole chain reproduces in DuckDB BIGINT without overflow.
    // divide (not multiply by a reciprocal): bit-identical to the SQL
    // oracle's `/ sqrt(dOut)`
    val s = java.lang.Math.floorMod(seed, 1000000007L)
    transform(sequence(lit(0), lit(dOut - 1)), k =>
      aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (x, j) => {
          val mixed = (j.cast("long") * 1000003L + k.cast("long") +
            lit(s)) % 1000000007L
          val h = (mixed * 2654435761L) % 1000000007L
          when(h % 2 === 0, x).otherwise(-x)
        }),
        lit(0.0), (acc, v) => acc + v) / lit(math.sqrt(dOut.toDouble)))
  }

  /** Matryoshka-style dimension truncation: keep the first `d`
    * components and L2-renormalize — the standard memory/latency knob
    * for embeddings trained with nested representations (Kusupati et
    * al. 2022): downstream cosine math works unchanged at the reduced
    * width. Row-local slice + normalize, zero shuffle; zero vectors
    * stay zero.
    */
  def truncateNormalize(a: Column, d: Int): Column = {
    require(d >= 1, s"truncation dim must be >= 1, got $d")
    normalizeL2(slice(a, 1, d))
  }

  def normalizeL2(a: Column): Column = {
    val n = norm(a)
    when(n > 0, transform(a, x => x.cast("double") / n))
      .otherwise(a.cast("array<double>"))
  }

  /** Per-vector int8 quantization: struct(qmin, scale, codes) with
    * codes[i] = clamp(floor((x[i]-qmin)/scale + 0.5), 0, 255) — 4x less
    * resident memory per float embedding for ANN candidate stages, with
    * reconstruction error bounded by scale/2 per element. floor(z+0.5)
    * (not round) so the arithmetic is reproducible across engines
    * (SQL round() half-up vs half-even varies); constant vectors get
    * scale 0 and all-zero codes. Row-local codegen HOFs, zero shuffle.
    */
  def quantizeInt8(emb: Column): Column = {
    val qmin = array_min(emb).cast("double")
    val scale = (array_max(emb).cast("double") - qmin) / lit(255.0)
    val codes = transform(emb, x =>
      when(lit(0.0) === scale, lit(0))
        .otherwise(least(lit(255), greatest(lit(0),
          floor((x.cast("double") - qmin) / scale + lit(0.5))
            .cast("int")))))
    struct(qmin.as("qmin"), scale.as("scale"), codes.as("codes"))
  }

  /** Inverse of [[quantizeInt8]]: qmin + code * scale (double array). */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"),
      c => q.getField("qmin") + c.cast("double") * q.getField("scale"))

  /** Embedding dimensionality, read from the first row. */
  def dim(df: DataFrame, embCol: String): Int =
    df.select(size(col(embCol))).first().getInt(0)

  /** Per-dimension standardized outlier screen: each vector's score is
    * the diagonal-Mahalanobis energy sum_d ((x_d - mu_d) / sigma_d)^2
    * against the corpus's own per-dimension mean/variance (population;
    * near-constant dimensions, variance <= 1e-12, contribute 0 instead
    * of exploding). Top `topK` scores surface mislabeled, corrupt, or
    * out-of-distribution vectors BEFORE they poison contrastive
    * training — the embedding-space twin of [[Stats]]' IQR outliers.
    * Deterministic cut: 6-dp-rounded score desc, then id.
    *
    * Scale shape: ONE map-side-combined aggregate reduces the corpus
    * to two dim-length buffers + a count (rows never shuffle); scoring
    * is a row-local zip against the broadcast 1-row stats; the top-k
    * is a TakeOrdered (each partition contributes <= topK rows, no
    * global sort). Full covariance needs d^2 state — for correlated
    * dims at modest d, [[Pca]]'s whitening then THIS screen on the
    * whitened vectors is the exact route.
    */
  def embeddingOutliers(
      df: DataFrame,
      idCol: String,
      embCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val e = col(embCol).cast("array<double>")
    val stats = df.filter(col(embCol).isNotNull).agg(
      graft.functions.vec_sum(e).as("__s"),
      graft.functions.vec_sum(transform(e, x => x * x)).as("__s2"),
      count(lit(1)).cast("double").as("__n"))
    val m = transform(col("__s"), s => s / col("__n"))
    val v = zip_with(col("__s2"), col("__s"), (s2, s1) =>
      s2 / col("__n") - (s1 / col("__n")) * (s1 / col("__n")))
    val contrib = zip_with(
      zip_with(e, m, (x, mu) => x - mu), v,
      (d0, vv) => when(vv > 1e-12, d0 * d0 / vv).otherwise(lit(0.0)))
    df.filter(col(embCol).isNotNull)
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        (round(aggregate(contrib, lit(0.0), (acc, x) => acc + x), 6) +
          lit(0.0)).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Deterministic random hyperplanes (fixed seed — reproducible runs). */
  def randomPlanes(nPlanes: Int, dims: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dims)(rnd.nextGaussian()))
  }

  /** Cross-corpus SEMANTIC decontamination screen — the embedding-space
    * member of the contamination family ([[Dedup.ngramContamination]],
    * [[Dedup.bloomDecontaminate]], [[Dedup.crossCorpusNearDups]]):
    * every (train, eval) pair whose cosine reaches `threshold`
    * (compared on the 6-dp-rounded value so any two engines cut
    * identically). Catches paraphrased or reformatted eval leakage
    * that exact n-gram screens miss. Zero-norm vectors never match.
    *
    * Scale shape: the eval side is BROADCAST (an eval benchmark is
    * bounded by construction); the train corpus never shuffles — the
    * pair scan is map-only and the output is bounded by actual
    * matches. Cost is |train| x |eval| x d row-local flops; for an
    * eval side too large to broadcast, go through [[ivfTopK]] with a
    * distance cut instead.
    */
  def semanticContamination(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    val te = col("__te"); val ee = col("__ee")
    val cos = (round(
      graft.functions.vec_dot(te, ee) /
        (sqrt(graft.functions.vec_dot(te, te)) *
          sqrt(graft.functions.vec_dot(ee, ee))), 6) + lit(0.0))
    train
      .select(col(idCol).as("train_id"),
        col(embCol).cast("array<double>").as("__te"))
      .filter(te.isNotNull)
      .crossJoin(broadcast(eval
        .select(col(idCol).as("eval_id"),
          col(embCol).cast("array<double>").as("__ee"))
        .filter(ee.isNotNull)))
      .filter(graft.functions.vec_dot(te, te) > 0 &&
        graft.functions.vec_dot(ee, ee) > 0)
      .select(col("train_id"), col("eval_id"), cos.as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** The surviving train rows after [[semanticContamination]]: a
    * left-anti join on the flagged train ids (payload columns pass
    * through untouched).
    */
  def semanticDecontaminate(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double): DataFrame = {
    val flagged = semanticContamination(train, eval, idCol, embCol,
      threshold).select(col("train_id").as(idCol)).distinct()
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Explode a top-k array (from [[graft.functions.topk_agg]]) back into
    * (query_id, item_id, cosine, rank) rows, item_id cast to `idType`.
    */
  private def explodeTopK(grouped: DataFrame, idType: org.apache.spark.sql.types.DataType): DataFrame =
    grouped
      .select(col("query_id"), posexplode(col("topk")).as(Seq("r", "t")))
      .select(col("query_id"),
        col("t.item_id").cast(idType).as("item_id"),
        col("t.score").as("cosine"),
        (col("r") + 1).as("rank"))

  /** Exact cosine top-k neighbors for each query row.
    *
    * `queries` is expected to be small (it is broadcast); the corpus side
    * never shuffles scored rows — the bounded top-k aggregate reduces each
    * partition to k entries per query BEFORE the exchange, so the shuffle
    * carries <= partitions x |queries| x k rows regardless of corpus size
    * (the window row_number() formulation shuffled all |corpus| x |queries|
    * scored rows into per-query partitions first).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val idType = corpus.schema(idCol).dataType
    // norms hoisted to per-ROW columns: |a| and |b| compute n + q
    // times instead of n x q, and the per-pair score keeps cosine()'s
    // exact fp shape (dot / (qnorm * inorm)) — bit-identical results
    // the corpus side does the n x q cosine scoring map-side: spread an
    // under-split scan (no-op at scale, Parallelism.spreadIfNarrow) so
    // the scoring runs at session parallelism instead of the file's
    // split count (measured: the whole 4M-pair stage on ONE task)
    val c = Parallelism.spreadIfNarrow(
      corpus.select(col(idCol).as("item_id"),
        col(embCol).as("item_emb"), norm(col(embCol)).as("__in")))
    val q = queries.select(col(idCol).as("query_id"),
      col(embCol).as("query_emb"), norm(col(embCol)).as("__qn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("item_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("item_id"),
        when(col("__qn") > 0 && col("__in") > 0,
          dot(col("query_emb"), col("item_emb")) /
            (col("__qn") * col("__in"))).otherwise(0.0).as("cosine"))
    val grouped = scored.groupBy(col("query_id"))
      .agg(topk_agg(col("cosine"), col("item_id"), k).as("topk"))
    explodeTopK(grouped, idType)
  }

  /** Hard-negative mining for contrastive training: for each anchor
    * vector, the `k` most-similar vectors carrying a DIFFERENT label
    * (null-safe mismatch — a NULL label differs from every non-NULL) —
    * the pairs that teach a metric model the most, vs
    * [[Sampling.negativeSample]]'s uniform negatives. Ranking happens
    * per anchor among mismatched candidates only, so same-label
    * near-neighbors cannot crowd negatives out of the top-k.
    * Output: (anchor_id, negative_id, cosine, rank).
    *
    * Scale shape: the labeled-set regime of [[bruteForceTopK]] — the
    * frame broadcasts as its own query side (a labeled contrastive
    * seed set is small by construction; bound it visibly with
    * `.limit(n)` so the plan proves it), the corpus side never
    * shuffles scored rows (the bounded top-k aggregate reduces each
    * partition to k entries per anchor before the exchange). For a
    * corpus-scale anchor set, go through [[ivfTopK]] with a
    * post-filter and an over-fetched k instead.
    */
  def hardNegatives(
      df: DataFrame,
      idCol: String,
      embCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val idType = df.schema(idCol).dataType
    // same corpus-side spread as bruteForceTopK: the anchor x corpus
    // scoring is map-side and serializes on an under-split scan
    val c = Parallelism.spreadIfNarrow(
      df.select(col(idCol).as("item_id"),
        col(embCol).as("item_emb"), col(labelCol).as("__il"),
        norm(col(embCol)).as("__in")))
    val q = df.select(col(idCol).as("query_id"),
      col(embCol).as("query_emb"), col(labelCol).as("__ql"),
      norm(col(embCol)).as("__qn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("item_id") =!= col("query_id") &&
        !(col("__il") <=> col("__ql")))
      .select(col("query_id"), col("item_id"),
        when(col("__qn") > 0 && col("__in") > 0,
          dot(col("query_emb"), col("item_emb")) /
            (col("__qn") * col("__in"))).otherwise(0.0).as("cosine"))
    val grouped = scored.groupBy(col("query_id"))
      .agg(topk_agg(col("cosine"), col("item_id"), k).as("topk"))
    explodeTopK(grouped, idType)
      .select(col("query_id").as("anchor_id"),
        col("item_id").as("negative_id"), col("cosine"), col("rank"))
  }

  /** Nearest-centroid assignment strategy: small codebooks embed in the
    * expression (no broadcast round-trip); above the threshold the table
    * ships as a torrent broadcast once per executor instead of riding
    * inside every serialized task.
    */
  private[ops] def assignTopCentroids(
      sc: org.apache.spark.SparkContext,
      centroidBroadcastThreshold: Int)(
      emb: Column, cs: Array[Array[Double]], n: Int): Column =
    if (cs.length <= centroidBroadcastThreshold) top_centroids(emb, cs, n)
    else graft.functions.top_centroids_bcast(emb, sc.broadcast(cs), n)

  /** Deterministic k-means codebook over `c` (item_id, item_emb columns):
    * init = first nCentroids rows by id, refined by `iterations` Lloyd
    * steps. Each step is one map-only assignment pass plus a tiny
    * aggregate (`groupBy(centroid).agg(vec_sum, count)` — nCentroids rows
    * collected, nothing else reaches the driver). Empty clusters keep
    * their previous centroid.
    */
  private[ops] def fitCentroids(
      c: DataFrame,
      nCentroids: Int,
      iterations: Int,
      centroidBroadcastThreshold: Int): Array[Array[Double]] = {
    val sc = c.sparkSession.sparkContext
    val assign = assignTopCentroids(sc, centroidBroadcastThreshold) _
    var centroids: Array[Array[Double]] = c.orderBy(col("item_id"))
      .limit(nCentroids).collect()
      .map(r => r.getSeq[Double](1).toArray)
    // an empty corpus has no rows to sample — return no centroids and
    // let callers short-circuit to an empty result instead of feeding a
    // zero-length codebook into the assignment expression
    if (centroids.isEmpty) return centroids
    (0 until iterations).foreach { _ =>
      val refined = c
        .select(assign(col("item_emb"), centroids, 1)(0).as("centroid_id"),
          col("item_emb"))
        .groupBy(col("centroid_id"))
        .agg(vec_sum(col("item_emb")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => r.getInt(0) ->
          r.getSeq[Double](1).map(_ / r.getLong(2)).toArray)
        .toMap
      centroids = centroids.indices
        .map(i => refined.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** IVF-pruned approximate top-k: assign corpus rows to their nearest
    * centroid via [[graft.functions.TopCentroids]] (a map-only pass over a
    * centroid literal), then answer each query by scanning only its nProbe
    * nearest inverted lists.
    *
    * Centroids: deterministic sample (first nCentroids by id) refined by
    * `iterations` Lloyd steps. Each step is one map pass + one tiny
    * aggregate (`groupBy(centroid).agg(vec_sum, count)` — nCentroids rows
    * collected, nothing else reaches the driver).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      iterations: Int = 2,
      centroidBroadcastThreshold: Int = 1024): DataFrame = {
    val idType = corpus.schema(idCol).dataType
    // array-level Cast (codegen'd), not transform(x => x.cast) — the HOF
    // evaluates an interpreted lambda per element on every pass.
    // NOT spread (Parallelism.spreadIfNarrow): the centroid training
    // runs several separate driver-side jobs over this frame, and each
    // re-executes an added repartition exchange (shuffle reuse is
    // per-query, not per-session) — measured flat on ann_ivf and a 2x
    // REGRESSION on the PQ sibling, so the scan's split count stays
    val c = corpus.select(col(idCol).as("item_id"),
      col(embCol).cast("array<double>").as("item_emb"))

    val sc = corpus.sparkSession.sparkContext
    def assignTop(emb: Column, cs: Array[Array[Double]], n: Int): Column =
      assignTopCentroids(sc, centroidBroadcastThreshold)(emb, cs, n)

    val centroids = fitCentroids(c, nCentroids, iterations,
      centroidBroadcastThreshold)
    // empty corpus -> no centroids, no neighbors (typed empty result,
    // not a zero-length-codebook error)
    if (centroids.isEmpty)
      return queries.select(col(idCol).as("query_id"),
        col(idCol).as("item_id"), lit(0.0).as("cosine"),
        lit(0).as("rank")).limit(0)

    // norms hoisted per ROW (n + q computations instead of per-pair);
    // the per-pair score keeps cosine()'s exact fp shape
    val inverted = c.select(col("item_id"), col("item_emb"),
      norm(col("item_emb")).as("__in"),
      assignTop(col("item_emb"), centroids, 1)(0).as("centroid_id"))

    // query -> nProbe nearest centroids (same single-pass expression)
    val q = queries.select(col(idCol).as("query_id"),
      col(embCol).cast("array<double>").as("query_emb"))
    val probes = q.select(col("query_id"), col("query_emb"),
      norm(col("query_emb")).as("__qn"),
      explode(assignTop(col("query_emb"), centroids, nProbe))
        .as("centroid_id"))

    val grouped = inverted.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        when(col("__qn") > 0 && col("__in") > 0,
          dot(col("query_emb"), col("item_emb")) /
            (col("__qn") * col("__in"))).otherwise(0.0).as("cosine"))
      .groupBy(col("query_id"))
      .agg(topk_agg(col("cosine"), col("item_id"), k).as("topk"))
    explodeTopK(grouped, idType)
  }

  /** Persist an IVF index as CorpusStore tables — the vector index AT
    * REST: `<table>_centroids` (the Lloyd-refined codebook, one bucket)
    * and `<table>_lists` (item_id, item_emb, item_norm, centroid_id —
    * the inverted lists, bucketed on centroid_id with norms
    * precomputed). Clustering, assignment, and norm computation are the
    * corpus-sized passes of IVF — the store pays them ONCE; every
    * subsequent query batch via [[ivfTopKStored]] is a broadcast probe
    * join against the bucketed lists, with zero corpus-side recompute
    * or exchange. Rewrites are staged (CorpusStore's swap-on-success),
    * so a failed re-index never destroys the serving index.
    */
  def writeIvfIndex(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      table: String,
      nCentroids: Int = 16,
      iterations: Int = 2,
      numBuckets: Int = 16,
      centroidBroadcastThreshold: Int = 1024): Unit = {
    val c = corpus.select(col(idCol).as("item_id"),
      col(embCol).cast("array<double>").as("item_emb"))
    val centroids = fitCentroids(c, nCentroids, iterations,
      centroidBroadcastThreshold)
    require(centroids.nonEmpty, "cannot index an empty corpus")
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = centroids.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq
      .toDF("centroid_id", "centroid")
    graft.io.CorpusStore.writeBucketed(centDf, s"${table}_centroids",
      "centroid_id", 1)
    val sc = spark.sparkContext
    val assign = assignTopCentroids(sc, centroidBroadcastThreshold) _
    val lists = c.select(col("item_id"), col("item_emb"),
      norm(col("item_emb")).as("item_norm"),
      assign(col("item_emb"), centroids, 1)(0).as("centroid_id"))
    graft.io.CorpusStore.writeBucketed(lists, s"${table}_lists",
      "centroid_id", numBuckets)
  }

  /** GROW an IVF index with a new batch: rows assign to the EXISTING
    * stored centroids (no re-clustering — the codebook is the index's
    * contract; recall of old queries is untouched) and append to the
    * inverted lists. After heavy growth the codebook drifts from the
    * data's true centers; periodically re-index with [[writeIvfIndex]].
    */
  def appendToIvfIndex(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      table: String,
      centroidBroadcastThreshold: Int = 1024): Unit = {
    val spark = corpus.sparkSession
    val centroids = graft.io.CorpusStore
      .readBucketed(spark, s"${table}_centroids")
      .orderBy(col("centroid_id")).collect()
      .map(_.getSeq[Double](1).toArray)
    require(centroids.nonEmpty, s"$table has an empty codebook")
    val n = graft.io.CorpusStore.storedNumBuckets(spark, s"${table}_lists")
    val sc = spark.sparkContext
    val assign = assignTopCentroids(sc, centroidBroadcastThreshold) _
    val lists = corpus.select(col(idCol).as("item_id"),
      col(embCol).cast("array<double>").as("item_emb"))
      .select(col("item_id"), col("item_emb"),
        norm(col("item_emb")).as("item_norm"),
        assign(col("item_emb"), centroids, 1)(0).as("centroid_id"))
    graft.io.CorpusStore.appendBucketed(lists, s"${table}_lists",
      "centroid_id", n)
  }

  /** [[ivfTopK]] against a [[writeIvfIndex]] store: the codebook is a
    * constant-bounded collect (nCentroids rows), queries assign to
    * their nProbe lists row-locally and broadcast into the bucketed
    * inverted-list scan — the stored corpus never re-clusters,
    * re-assigns, re-norms, or shuffles; the only exchange is the
    * bounded per-query top-k aggregate. nProbe = nCentroids makes the
    * search exhaustive (equal to brute force), which is the
    * driver-oracle invariant.
    */
  def ivfTopKStored(
      queries: DataFrame,
      table: String,
      idCol: String,
      embCol: String,
      k: Int,
      nProbe: Int = 4,
      centroidBroadcastThreshold: Int = 1024): DataFrame = {
    val spark = queries.sparkSession
    val centroids = graft.io.CorpusStore
      .readBucketed(spark, s"${table}_centroids")
      .orderBy(col("centroid_id")).collect()
      .map(_.getSeq[Double](1).toArray)
    val idType = queries.schema(idCol).dataType
    val sc = spark.sparkContext
    def assignTop(emb: Column, cs: Array[Array[Double]], n: Int): Column =
      assignTopCentroids(sc, centroidBroadcastThreshold)(emb, cs, n)
    val q = queries.select(col(idCol).as("query_id"),
      col(embCol).cast("array<double>").as("query_emb"))
    val probes = q.select(col("query_id"), col("query_emb"),
      norm(col("query_emb")).as("__qn"),
      explode(assignTop(col("query_emb"), centroids, nProbe))
        .as("centroid_id"))
    val inverted = graft.io.CorpusStore
      .readBucketed(spark, s"${table}_lists")
    val grouped = inverted.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        when(col("__qn") > 0 && col("item_norm") > 0,
          dot(col("query_emb"), col("item_emb")) /
            (col("__qn") * col("item_norm"))).otherwise(0.0).as("cosine"))
      .groupBy(col("query_id"))
      .agg(topk_agg(col("cosine"), col("item_id"), k).as("topk"))
    explodeTopK(grouped, idType)
  }

  /** Recall@k of an approximate ANN result against an exact one (both
    * in the (query_id, item_id, cosine, rank) shape the top-k ops
    * return): per-query fraction of the exact neighbors the approximate
    * search recovered — the tuning loop for nProbe / rerank / ksub.
    *
    * Exact-side-driven: the report carries one row per query present in
    * `exact`; queries only in `approx` contribute nothing (there is no
    * ground truth to recall against). The approx side is de-duplicated
    * before the join so a result frame carrying repeated
    * (query_id, item_id) pairs cannot multiply exact rows and inflate
    * n_exact.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame =
    exact.select(col("query_id"), col("item_id"))
      .join(approx.select(col("query_id"), col("item_id")).distinct()
        .withColumn("__hit", lit(1)), Seq("query_id", "item_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hit"))
      .select(col("query_id"), col("n_exact"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact")).as("recall"))

  /** Product-quantization codebooks: `m` per-subspace codebooks of `ksub`
    * centroids each, trained by euclidean Lloyd over a DETERMINISTIC
    * hash-sample of the corpus (`trainRows` expected rows — PQ training
    * cost is independent of corpus size; only encode touches every row).
    * Returns codebooks(j)(code) = the dsub-dim centroid, dsub = d/m.
    *
    * Assignment inside Lloyd is euclidean argmin (via the same
    * [[graft.functions.pq_encode_bcast]] expression encode uses, one
    * sub-codebook at a time) — NOT the cosine ranking [[ivfTopK]]'s
    * coarse router uses: subvector norms carry signal, so quantization
    * must minimize ||x - c||, not angle.
    */
  def pqTrain(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      m: Int,
      ksub: Int,
      iterations: Int = 3,
      trainRows: Long = 65536L): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 1)
    val sc = corpus.sparkSession.sparkContext
    val c = corpus.select(col(idCol).as("item_id"),
      col(embCol).cast("array<double>").as("item_emb"))
    val total = c.count()
    if (total == 0) return Array.fill(m)(Array.empty[Array[Double]])
    val d = dim(corpus, embCol)
    require(d % m == 0, s"embedding dim $d must be divisible by m=$m")
    val dsub = d / m
    val frac = math.min(1.0, trainRows.toDouble / total)
    val sample = (if (frac < 1.0)
      c.filter(graft.ops.Sampling.md5Hash52(col("item_id")) <
        lit((frac * (1L << 52).toDouble).toLong))
    else c).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // init: first ksub sampled rows by id (ONE bounded collect),
      // sliced into every subspace driver-side
      val initRows = sample.orderBy(col("item_id")).limit(ksub).collect()
        .map(_.getSeq[Double](1).toArray)
      if (initRows.isEmpty) return Array.fill(m)(Array.empty[Array[Double]])
      var codebooks: Array[Array[Array[Double]]] = (0 until m).map(j =>
        initRows.map(v => v.slice(j * dsub, (j + 1) * dsub))).toArray
      // each Lloyd step is ONE pass over the sample for ALL m subspaces
      // (the per-subspace loop would run m x iterations jobs): encode all
      // codes in one expression call, explode to (subspace, code, subvec),
      // reduce to m x ksub rows — the only thing the driver ever collects
      (0 until iterations).foreach { _ =>
        val bc = sc.broadcast(codebooks)
        val refined = sample
          .select(graft.functions.pq_encode_bcast(col("item_emb"), bc)
            .as("codes"), col("item_emb"))
          .select(posexplode(col("codes")).as(Seq("j", "code")),
            col("item_emb"))
          .select(col("j"), col("code"),
            slice(col("item_emb"), col("j") * dsub + 1, lit(dsub)).as("sub"))
          .groupBy(col("j"), col("code"))
          .agg(vec_sum(col("sub")).as("s"), count(lit(1)).as("n"))
          .collect()
          .map(r => (r.getInt(0), r.getInt(1)) ->
            r.getSeq[Double](2).map(_ / r.getLong(3)).toArray)
          .toMap
        codebooks = codebooks.zipWithIndex.map { case (cb, j) =>
          cb.indices.map(i => refined.getOrElse((j, i), cb(i))).toArray
        }
      }
      codebooks
    } finally { sample.unpersist(); () }
  }

  /** IVF-PQ approximate top-k: the scale path past [[ivfTopK]]. Corpus
    * rows carry an 8-ish-byte PQ code instead of the full vector through
    * the candidate stage, so the frame the probe join scans is ~d*4/m
    * times smaller than the raw embeddings; full vectors are touched
    * only in the final exact re-rank, whose size is bounded by
    * |queries| x rerank.
    *
    *  1. Both sides L2-normalize (cosine becomes a plain dot product,
    *     and ADC over normalized vectors approximates cosine directly).
    *  2. Coarse router: [[fitCentroids]] + nProbe-cell probing, exactly
    *     [[ivfTopK]]'s pruning.
    *  3. Candidates score by PQ asymmetric distance
    *     ([[graft.functions.pq_adc_bcast]] — no reconstruction
    *     allocation) into a bounded top-`rerank` aggregate.
    *  4. Exact re-rank: the bounded candidate ids broadcast back against
    *     the corpus scan (map-side join — the corpus never shuffles),
    *     exact dot, bounded top-k.
    *
    * Raw-vector PQ (not residual PQ): codes quantize the normalized
    * vectors themselves, keeping encode a single map pass; residual
    * encoding would couple codes to the coarse assignment for moderate
    * extra recall. Documented trade — revisit if recall at scale
    * disappoints.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      rerank: Int = 0,
      iterations: Int = 2,
      centroidBroadcastThreshold: Int = 1024,
      residual: Boolean = false): DataFrame = {
    val idType = corpus.schema(idCol).dataType
    val rerankN = if (rerank > 0) rerank else 4 * k
    val sc = corpus.sparkSession.sparkContext
    // NOT spread (Parallelism.spreadIfNarrow): coarse + m sub-codebook
    // training passes are separate driver-side jobs that each re-run an
    // added repartition exchange — measured 2.17 -> 4.43 s on the bench
    // row before this note
    val c = corpus.select(col(idCol).as("item_id"),
      normalizeL2(col(embCol)).as("item_emb"))
    val q = queries.select(col(idCol).as("query_id"),
      normalizeL2(col(embCol)).as("query_emb"))

    def assignTop(emb: Column, cs: Array[Array[Double]], n: Int): Column =
      assignTopCentroids(sc, centroidBroadcastThreshold)(emb, cs, n)

    val coarse = fitCentroids(c, nCentroids, iterations,
      centroidBroadcastThreshold)
    if (coarse.isEmpty)
      return queries.select(col(idCol).as("query_id"),
        col(idCol).as("item_id"), lit(0.0).as("cosine"),
        lit(0).as("rank")).limit(0)
    // residual mode (classic IVF-PQ refinement): codes quantize
    // x - centroid(cell), so each codebook only has to cover the spread
    // WITHIN a cell rather than the whole space — finer resolution from
    // the same m x ksub budget. ADC then scores
    // dot(q, centroid_cell) + adc(q, residual codes).
    val centroidLit = array(coarse.toIndexedSeq.map(cArr => typedLit(cArr)): _*)
    def cellCentroid(cid: Column): Column = element_at(centroidLit, cid + 1)
    val assigned = c.select(col("item_id"), col("item_emb"),
      assignTop(col("item_emb"), coarse, 1)(0).as("centroid_id"))
    val encBase = if (residual)
      assigned.withColumn("__enc",
        zip_with(col("item_emb"), cellCentroid(col("centroid_id")),
          (x, y) => x - y))
    else assigned.withColumn("__enc", col("item_emb"))
    val codebooks = pqTrain(
      encBase.select(col("item_id"), col("__enc").as("item_emb")),
      "item_id", "item_emb", m, ksub)
    val bc = sc.broadcast(codebooks)

    // ONE map pass builds the narrow searchable frame: id + cell + codes
    val encoded = encBase.select(col("item_id"), col("centroid_id"),
      graft.functions.pq_encode_bcast(col("__enc"), bc).as("codes"))

    val probes0 = q.select(col("query_id"), col("query_emb"),
      explode(assignTop(col("query_emb"), coarse, nProbe))
        .as("centroid_id"))
    val probes = if (residual)
      probes0.withColumn("__cdot",
        dot(col("query_emb"), cellCentroid(col("centroid_id"))))
    else probes0.withColumn("__cdot", lit(0.0))

    val candidates = encoded.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"),
        (col("__cdot") +
          graft.functions.pq_adc_bcast(col("query_emb"), col("codes"), bc))
          .as("adc"), col("item_id"))
      .groupBy(col("query_id"))
      .agg(topk_agg(col("adc"), col("item_id"), rerankN).as("topk"))
      .select(col("query_id"), explode(col("topk")).as("t"))
      .select(col("query_id"), col("t.item_id").as("item_id"))

    // exact re-rank over the bounded candidate set: candidates broadcast,
    // corpus streams map-side; normalized vectors make dot == cosine
    val grouped = c.join(broadcast(candidates),
        c("item_id") === candidates("item_id"))
      .select(col("query_id"), c("item_id").as("item_id"), col("item_emb"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("item_id"),
        dot(col("query_emb"), col("item_emb")).as("cosine"))
      .groupBy(col("query_id"))
      .agg(topk_agg(col("cosine"), col("item_id"), k).as("topk"))
    explodeTopK(grouped, idType)
  }

  /** Label-noise screen by k-NN disagreement (the Confident-Learning /
    * deep-kNN style heuristic): for every labeled vector, find its k
    * nearest neighbors among the OTHER labeled vectors and compare the
    * neighborhood's labels to its own. A point whose neighborhood
    * majority disagrees is a mislabeling candidate.
    *
    * `neighbors` is any (query_id, item_id) frame — [[bruteForceTopK]]
    * for exact small/eval corpora, [[ivfTopK]]/[[ivfPqTopK]] at corpus
    * scale — so the scoring works unchanged on either path. Output per
    * query: own `label`, the neighborhood `majority_label` (ties break
    * to the smallest label), `n_neighbors`, `disagree_frac` (fraction
    * of neighbors whose label differs from the point's own), and
    * `suspect` (majority label differs from own).
    *
    * Scale shape: two joins on skinny (id, label) rows — the label side
    * of each is the full corpus, hash-partitioned on the id key — then
    * two bounded aggregations of n·k rows. Embeddings never move here;
    * only the neighbor-id pairs from the ANN stage do.
    */
  def labelNoiseFromNeighbors(
      neighbors: DataFrame,
      labels: DataFrame,
      idCol: String,
      labelCol: String): DataFrame = {
    val lbl = labels.select(col(idCol).as("__id"), col(labelCol).as("__lbl"))
    val joined = neighbors.select(col("query_id"), col("item_id"))
      .join(lbl.withColumnRenamed("__id", "item_id")
        .withColumnRenamed("__lbl", "__nl"), Seq("item_id"))
      .join(lbl.withColumnRenamed("__id", "query_id")
        .withColumnRenamed("__lbl", "__ol"), Seq("query_id"))
    val perLabel = joined.groupBy(col("query_id"), col("__ol"), col("__nl"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__c").desc, col("__nl").asc)
    perLabel
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("query_id"))
      .agg(
        first(col("__ol")).as("label"),
        max(when(col("__rn") === 1, col("__nl"))).as("majority_label"),
        sum(col("__c")).as("n_neighbors"),
        (sum(when(col("__nl") =!= col("__ol"), col("__c")).otherwise(lit(0)))
          .cast("double") / sum(col("__c"))).as("disagree_frac"))
      .withColumn("suspect", col("majority_label") =!= col("label"))
  }

  /** Deterministic cosine k-means clustering over an embedding frame:
    * init = first `k` rows by id, refined by `iterations` Lloyd steps
    * (assignment by the codegen'd [[graft.functions.TopCentroids]]
    * cosine argmax over a driver-side centroid literal; update = plain
    * per-cluster mean — the same cells [[ivfTopK]] and SemDeDup
    * build on, exposed as a first-class operator). Returns one row per
    * input: (idCol, cluster) with cluster in [0, k).
    *
    * Scale shape: training cost is `iterations` map-only passes plus a
    * k-row aggregate each (nothing but k centroids ever reaches the
    * driver); the final assignment is one more map-only pass. Zero
    * shuffles of the corpus at any size.
    */
  def kmeansClusters(
      df: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      iterations: Int = 2,
      centroidBroadcastThreshold: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val c = df.select(col(idCol).as("item_id"),
      col(embCol).cast("array<double>").as("item_emb"))
    val cs = fitCentroids(c, k, iterations, centroidBroadcastThreshold)
    if (cs.isEmpty)
      return c.select(col("item_id").as(idCol),
        lit(0L).as("cluster")).limit(0)
    val assign = assignTopCentroids(
      df.sparkSession.sparkContext, centroidBroadcastThreshold) _
    c.select(col("item_id").as(idCol),
      assign(col("item_emb"), cs, 1)(0).cast("long").as("cluster"))
  }

  /** Convenience: self-kNN label-noise screen over one labeled
    * embedding frame, AUTO-ROUTED on a measured corpus count (the
    * [[Joins.autoJoin]] probe precedent — commit to a broadcast only
    * after measuring): at or below `bruteForceThreshold` rows the
    * neighbors are exact ([[bruteForceTopK]], where the whole frame
    * broadcasts as the query side — the threshold bounds exactly that
    * broadcast); above it the search routes through [[ivfTopK]], whose
    * corpus side streams map-only against a broadcast codebook at any
    * scale. Routed neighbors are exact when `nProbe == nCentroids`
    * (exhaustive probing == brute force — the spec-pinned boundary
    * property) and approximate otherwise, which is the standard ANN
    * trade at corpus scale. The probe is ONE count aggregate; callers
    * that already know their regime can call [[bruteForceTopK]] /
    * [[ivfTopK]] + [[labelNoiseFromNeighbors]] directly and skip it.
    */
  def knnLabelNoise(
      df: DataFrame,
      idCol: String,
      embCol: String,
      labelCol: String,
      k: Int,
      bruteForceThreshold: Long = 20000L,
      nCentroids: Int = 16,
      nProbe: Int = 16): DataFrame = {
    require(bruteForceThreshold >= 0,
      s"bruteForceThreshold must be >= 0, got $bruteForceThreshold")
    val nb =
      if (df.count() <= bruteForceThreshold)
        bruteForceTopK(df, df, idCol, embCol, k)
      else ivfTopK(df, df, idCol, embCol, k, nCentroids, nProbe)
    labelNoiseFromNeighbors(nb, df, idCol, labelCol)
  }

  /** Per-source embedding cohesion/separation report — the data-mix
    * diagnostic that says whether the declared sources actually
    * occupy distinct regions of embedding space (a source whose
    * members sit closer to another source's centroid than their own
    * is mislabeled, duplicated, or not a real distribution): one row
    * per key — n, centroid_norm, `intra_cos` (mean member-to-own-
    * centroid cosine, cohesion), the nearest OTHER centroid
    * (`nearest_key`, `nearest_cos` — the confusion direction; ties
    * break to the larger key), and `separation = intra_cos -
    * nearest_cos` (positive and large = clean separation). Keys with
    * no peer (single-source input) carry NULL nearest/separation.
    *
    * Scale shape: ONE (key)-grouped [[graft.functions.vec_sum]]
    * aggregate builds the K centroids (K = source count — tiny by
    * definition); members score against their own centroid through a
    * broadcast join and one row-local codegen cosine + grouped avg;
    * the K x K centroid comparison stays in-plan on the K-row
    * aggregate output. The corpus is read twice (centroid pass +
    * scoring pass) and never shuffles beyond the two grouped
    * aggregates.
    */
  def sourceSeparation(
      df: DataFrame, keyCol: String, embCol: String): DataFrame = {
    val rows = df
      .filter(col(keyCol).isNotNull && col(embCol).isNotNull)
      .select(col(keyCol).as("key"),
        col(embCol).cast("array<double>").as("e"))
    val cents = rows.groupBy(col("key"))
      .agg(vec_sum(col("e")).as("__s"), count(lit(1)).as("n"))
      .select(col("key"), col("n"),
        transform(col("__s"), x => x / col("n")).as("c"))
    val intra = rows
      .join(broadcast(cents.select(col("key"), col("c"))), Seq("key"))
      .groupBy(col("key"))
      .agg(avg(cosine(col("e"), col("c"))).as("intra_cos"))
    val cross = cents.select(col("key"), col("c"))
      .crossJoin(broadcast(
        cents.select(col("key").as("__k2"), col("c").as("__c2"))))
      .filter(col("key") =!= col("__k2"))
      .select(col("key"), col("__k2"),
        cosine(col("c"), col("__c2")).as("__cc"))
      .groupBy(col("key"))
      .agg(max_by(col("__k2"), struct(col("__cc"), col("__k2")))
        .as("nearest_key"),
        max(col("__cc")).as("nearest_cos"))
    cents
      .select(col("key"), col("n"), norm(col("c")).as("centroid_norm"))
      .join(intra, Seq("key"))
      .join(cross, Seq("key"), "left")
      .select(col("key"), col("n"), col("centroid_norm"),
        col("intra_cos"), col("nearest_key"), col("nearest_cos"),
        (col("intra_cos") - col("nearest_cos")).as("separation"))
  }
}
