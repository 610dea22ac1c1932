package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over edge tables — the authority/importance signal
  * used to weight sources in web-scale corpus curation (a la the
  * original PageRank use: rank pages, sample high-rank ones harder).
  *
  * Scale shape: the edge table is normalized (per-source transition
  * weight) ONCE, hash-partitioned on src, and persisted; every power
  * iteration then joins the skinny (node, rank) frame to it, aggregates
  * contributions by dst, and left-joins back onto the node set — two
  * exchanges of rank-sized (not edge-sized) rows per iteration plus the
  * edges' one-time shuffle. Each iteration materializes its rank frame
  * (persist + count) so lineage stays O(1) across iterations; the only
  * driver-side value per iteration is the 1-row dangling-mass sum.
  */
object Graph {

  /** Weighted PageRank by fixed power iteration.
    *
    * `edges` rows are (src, dst [, weight]); parallel edges are merged
    * by summing weight (count when `weightCol` is None). Nodes = all
    * distinct endpoints. Per iteration:
    *   r'(v) = (1-d)/N + d * ( sum_{(u,v)} r(u) * w(u,v)/W(u) + D/N )
    * where W(u) is u's total out-weight and D the mass on dangling
    * (no-out-edge) nodes, redistributed uniformly (the classic
    * random-surfer treatment). Rows with NULL endpoints or
    * non-positive weight are dropped.
    *
    * Returns (node, rank, scaled_rank = rank * N) — ranks sum to 1,
    * scaled_rank is 1.0 for an average node.
    *
    * The returned frame reads the FINAL persisted rank iterate (the
    * persist is what keeps re-executions O(1) instead of replaying the
    * whole iteration chain), so each call adds one node-sized cache
    * entry the session keeps until it is released — long-lived sessions
    * ranking many graphs should use [[pageRankReleasable]] and release
    * when done consuming the result.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String] = None,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame =
    pageRankReleasable(edges, srcCol, dstCol, weightCol, iterations,
      damping)._1

  /** [[pageRank]] plus a release() thunk for the final persisted rank
    * frame (re-executions of the returned frame after release replay
    * the full iteration chain — consume first, then release).
    */
  def pageRankReleasable(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String] = None,
      iterations: Int = 5,
      damping: Double = 0.85): (DataFrame, () => Unit) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull && w > 0)
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(w).as("w"))
    // Per-source transition probability folded into the edge weight so
    // the iteration join is a plain multiply. The per-source total is a
    // WINDOW over the merged edges, not an aggregate + self-join: the
    // window's src exchange is the only one after the merge, it doubles
    // as the persisted partitioning the iteration join reuses, and the
    // upstream edge plan is read exactly once (the join shape re-read
    // the edge aggregate on both sides and needed its own repartition).
    val norm = e0
      .select(col("src"), col("dst"),
        (col("w") / sum(col("w")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
          .as("p"))
      .persist()
    // distinct's own exchange already leaves the frame hash-partitioned
    // on node — the iteration's contribution join reuses it directly
    val nodes = norm.select(col("src").as("node"))
      .union(norm.select(col("dst").as("node")))
      .distinct()
      .persist()
    val n = nodes.count().toDouble
    val dangling = nodes.join(
      norm.select(col("src").as("node")).distinct(),
      Seq("node"), "left_anti").persist()

    // uniform init; materializes inside iteration 1's job (a trivial
    // projection of the already-counted nodes cache — no standalone job)
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank")).persist()
    for (_ <- 1 to iterations) {
      // dangling mass rides the iteration plan as a broadcast 1-row
      // aggregate instead of a separate driver action — ONE job per
      // iteration, and the persisted rank cache serves both reads
      val dMass = ranks.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val contrib = norm
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("p")).as("inflow"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dMass))
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("inflow"), lit(0.0)) +
              col("__dm") / lit(n))).as("rank"))
        .persist()
      next.count()
      ranks.unpersist(blocking = false)
      ranks = next
    }
    val finalRanks = ranks
    val out = finalRanks.select(col("node"), col("rank"),
      (col("rank") * n).as("scaled_rank"))
    norm.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    dangling.unpersist(blocking = false)
    (out, () => { finalRanks.unpersist(blocking = false); () })
  }

  /** Personalized PageRank: the random surfer teleports to the SEED
    * set (uniformly) instead of to every node — rank becomes
    * relevance-to-the-seeds, the standard seed-expansion primitive
    * for data selection ("find more like these"). Dangling mass also
    * returns to the seeds. Nodes unreachable from the seed set score
    * 0 exactly.
    *
    * Same iteration shape as [[pageRank]] (normalized edges persisted
    * on the join key once, rank-sized per-iteration exchanges, 1-row
    * broadcast dangling mass, O(1) lineage); the teleport vector
    * rides the persisted node frame as a column. Like [[pageRank]],
    * the result reads the final persisted iterate — long-lived
    * sessions should use [[personalizedPageRankReleasable]].
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      weightCol: Option[String] = None,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame =
    personalizedPageRankReleasable(edges, srcCol, dstCol, seeds,
      seedCol, weightCol, iterations, damping)._1

  /** [[personalizedPageRank]] plus a release() thunk for the final
    * persisted rank frame.
    */
  def personalizedPageRankReleasable(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      weightCol: Option[String] = None,
      iterations: Int = 5,
      damping: Double = 0.85): (DataFrame, () => Unit) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1,
      s"damping must be in (0,1), got $damping")
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull && w > 0)
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(w).as("w"))
    // single-pass normalize (the pageRank window shape — see there)
    val norm = e0
      .select(col("src"), col("dst"),
        (col("w") / sum(col("w")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
          .as("p"))
      .persist()
    val seedSet = seeds.filter(col(seedCol).isNotNull)
      .select(col(seedCol).as("node")).distinct()
    // distinct + the node-keyed seed join both leave the frame
    // hash-partitioned on node — no extra repartition
    val nodes = norm.select(col("src").as("node"))
      .union(norm.select(col("dst").as("node")))
      .distinct()
      .join(seedSet.withColumn("__s", lit(1)), Seq("node"), "left")
      .persist()
    val nSeeds = nodes.filter(col("__s").isNotNull).count().toDouble
    require(nSeeds > 0, "no seed appears in the graph")
    val tele = when(col("__s").isNotNull, lit(1.0 / nSeeds))
      .otherwise(lit(0.0))
    val dangling = nodes.join(
      norm.select(col("src").as("node")).distinct(),
      Seq("node"), "left_anti").select(col("node")).persist()

    // teleport-vector init; materializes inside iteration 1's job
    var ranks = nodes.select(col("node"), tele.as("rank")).persist()
    for (_ <- 1 to iterations) {
      val dMass = ranks.join(dangling, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      val contrib = norm
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("p")).as("inflow"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dMass))
        .select(col("node"),
          ((lit(1.0 - damping) + lit(damping) * col("__dm")) * tele +
            lit(damping) * coalesce(col("inflow"), lit(0.0)))
            .as("rank"))
        .persist()
      next.count()
      ranks.unpersist(blocking = false)
      ranks = next
    }
    val finalRanks = ranks
    val out = finalRanks.select(col("node"), col("rank"))
    norm.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    dangling.unpersist(blocking = false)
    (out, () => { finalRanks.unpersist(blocking = false); () })
  }

  /** HITS hubs-and-authorities over a directed edge table (Kleinberg
    * 1999): authority(v) = sum of hub scores pointing AT v, hub(u) =
    * sum of authority scores u points at, L1-normalized after every
    * update, `iterations` rounds from uniform hubs — the bipartite
    * complement to PageRank (in a purchase graph: hub = breadth of
    * buying, authority = breadth of being bought).
    *
    * Scale shape: the deduped edge set persists TWICE, partitioned on
    * dst (the authority-update join key) and on src (the hub-update
    * key), so neither update re-exchanges edges; scores are
    * node-sized, normalization is an in-plan 1-row broadcast, and
    * persist-and-swap keeps lineage O(1). The result joins the final
    * persisted hub AND authority iterates — long-lived sessions should
    * use [[hitsReleasable]].
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5): DataFrame =
    hitsReleasable(edges, srcCol, dstCol, iterations)._1

  /** [[hits]] plus a release() thunk for the final persisted hub and
    * authority frames.
    */
  def hitsReleasable(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5): (DataFrame, () => Unit) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    // NOT repartition(dst).distinct() (the r18 LPA/triangles one-exchange
    // setup): measured A/B REGRESSED here (7.58 -> 11.46 s, warmup
    // 9.1 -> 26.8 s) — HITS's dst copy feeds a second repartition(src)
    // cache build, and losing distinct's map-side partial dedup makes
    // BOTH cache builds carry the raw duplicated edge stream
    val eByDst = e.repartition(col("dst")).persist()
    // the src copy and the node set both derive from the dst copy's
    // CACHE, so the upstream edge plan (and the dedup) runs exactly once
    val eBySrc = eByDst.repartition(col("src")).persist()
    val nodes = eByDst.select(col("src").as("node"))
      .union(eByDst.select(col("dst").as("node")))
      .distinct()
      .persist()
    nodes.count()

    // uniform hub init materializes inside iteration 1's single job
    // (each iteration is ONE action: hNext.count() pulls aNext's
    // persist with it — the a-side cache fills en route).
    // The iteration carries SPARSE score frames: a node absent from
    // the frame has score exactly 0, and zero-score rows contribute
    // nothing to either update join's sums or to the L1 normalizers,
    // so densifying every round (the old nodes ⟕ raw coalesce joins)
    // was two dead node-sized joins per iteration — the zeros are
    // joined back on exactly once, at the output.
    var hubs = nodes.select(col("node"), lit(1.0).as("hub")).persist()
    var auths: DataFrame = null
    for (_ <- 1 to iterations) {
      val aRaw = eByDst
        .join(hubs.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("hub")).as("__a"))
      val aSum = aRaw.agg(sum(col("__a")).as("__s"))
      val aNext = aRaw
        .crossJoin(broadcast(aSum))
        .select(col("node"), (col("__a") / col("__s")).as("authority"))
        .persist()
      if (auths != null) auths.unpersist(blocking = false)
      auths = aNext
      val hRaw = eBySrc
        .join(auths.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(col("authority")).as("__h"))
      val hSum = hRaw.agg(sum(col("__h")).as("__s"))
      val hNext = hRaw
        .crossJoin(broadcast(hSum))
        .select(col("node"), (col("__h") / col("__s")).as("hub"))
        .persist()
      hNext.count()
      hubs.unpersist(blocking = false)
      hubs = hNext
    }
    val (finalHubs, finalAuths) = (hubs, auths)
    val out = nodes
      .join(finalHubs, Seq("node"), "left")
      .join(finalAuths, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("hub"), lit(0.0)).as("hub"),
        coalesce(col("authority"), lit(0.0)).as("authority"))
    eByDst.unpersist(blocking = false)
    eBySrc.unpersist(blocking = false)
    // nodes rides the RESULT plan (the one-time zero densify), so its
    // cache lives until release() with the final iterates
    (out, () => {
      nodes.unpersist(blocking = false)
      finalHubs.unpersist(blocking = false)
      finalAuths.unpersist(blocking = false)
      ()
    })
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own community; each iteration it adopts the most
    * frequent label among its neighbors AND itself (the self-vote
    * variant — one vote for the node's current label — which damps
    * the 2-cycle oscillation plain synchronous LPA exhibits on
    * bipartite structures), undirected (edges are symmetrized), ties
    * to the SMALLEST label, isolated nodes keep their own.
    * Deterministic at every step (synchronous update + total tie
    * order), so the result is replay- and partitioning-stable —
    * unlike the classic async LPA.
    *
    * Scale shape: the symmetrized edge set is deduped, partitioned on
    * src and persisted once; each iteration is one join against the
    * skinny (node, label) frame plus two bounded aggregations of
    * (node, label) cells — no neighbor lists are ever materialized
    * per-node. Persist-and-swap keeps lineage O(1).
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5): DataFrame =
    labelPropagationReleasable(edges, srcCol, dstCol, iterations)._1

  /** [[labelPropagation]] plus a release() thunk for the final
    * persisted label frame (the plain variant's result keeps it cached
    * for the session — the [[pageRank]] note applies).
    */
  def labelPropagationReleasable(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5): (DataFrame, () => Unit) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // NOTE the setup reads the input plan up to four times (symmetrize
    // twice, node census twice) — measured A/B at sf0.1, re-running a
    // cheap upstream plan beats an internal persist (columnar cache
    // build cost ~2.5s vs 4 x 0.4s recompute); callers whose edge
    // frame is expensive to recompute should persist() it first, the
    // standard Spark iterative-algorithm contract
    val ein = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e0 = ein
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    // partitioned on DST — the key every iteration's label join uses
    // (labels arrive hash-partitioned on the same key from the
    // previous round's aggregate, so the per-iteration join
    // re-exchanges neither side; only the (node, label) cell stream
    // moves)
    // ONE exchange builds the partitioned-and-deduped edge frame (r18):
    // repartition on dst FIRST, then distinct — hashpartitioning(dst)
    // already co-locates equal (src, dst) rows, so Catalyst plans the
    // dedup aggregate WITHOUT its own (src, dst) exchange and the output
    // keeps the dst partitioning every iteration join reuses. The
    // previous distinct().repartition(dst) shuffled the symmetrized
    // stream twice (2m records each way — the LpaScale receipt's
    // high-water stage).
    val und = e0.union(e0.select(col("dst").as("src"),
        col("src").as("dst")))
      .repartition(col("dst"))
      .distinct()
      .persist()
    // und's srcs are a subset of ein's non-null src/dst values, so the
    // census needs only the two input branches (the old und branch paid
    // an extra node-sized exchange plus an und scan for no coverage)
    val nodes = ein.filter(col("src").isNotNull).select(col("src").as("node"))
      .union(ein.filter(col("dst").isNotNull).select(col("dst").as("node")))
      .distinct()
      .persist()

    var labels = nodes.select(col("node"), col("node").as("label"))
      .persist()
    labels.count()
    for (_ <- 1 to iterations) {
      val neighborLabels = und
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("label"))
        .union(labels) // the self-vote
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
      // argmax label by (count desc, label asc) WITHOUT a sort:
      // min_by over the (negated count, label) struct collapses the
      // (node, label) CELL table — bounded by distinct neighbor
      // labels, not edges — in ONE hash aggregate. The previous
      // row_number window needed the same node exchange PLUS a sort
      // per iteration; struct ordering (-count first, then the label
      // itself) keeps the tie order identical and type-generic
      // (numeric or string labels alike)
      val best = neighborLabels
        .groupBy(col("node"))
        .agg(min_by(col("label"),
          struct((-col("__c")).as("c"), col("label").as("l")))
          .as("__new"))
      // the self-vote union guarantees every node contributes at least
      // its own-label cell, so `best` covers the full node set — no
      // fallback joins back onto nodes/labels are needed (isolated
      // nodes keep their own label through their single self-vote
      // cell); the agg output stays hash-partitioned on node, the key
      // the next iteration's neighbor join reuses
      val next = best.select(col("node"), col("__new").as("label"))
        .persist()
      next.count()
      labels.unpersist(blocking = false)
      labels = next
    }
    und.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    val finalLabels = labels
    (finalLabels, () => { finalLabels.unpersist(blocking = false); () })
  }

  /** Per-node degree statistics over a directed edge table: out_deg /
    * in_deg (parallel edges collapse; self-loops dropped) and `deg`,
    * the UNDIRECTED distinct-neighbor count. Two bounded aggregations
    * plus an outer join on the node key — nothing edge-sized survives
    * the first exchange.
    */
  def degreeStats(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val outD = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val inD = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    val und = e.union(e.select(col("dst").as("src"),
        col("src").as("dst"))).distinct()
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    und.join(outD, Seq("node"), "left")
      .join(inD, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        col("deg"))
  }

  /** Global triangle census of the UNDIRECTED graph: one row with
    * n_nodes, n_edges, n_wedges (= sum C(deg, 2), open two-paths),
    * n_triangles, and the global clustering coefficient
    * 3 * triangles / wedges (NULL on a wedge-free graph).
    *
    * Scale shape: the standard degree-orientation trick — edges point
    * from the (degree, id)-SMALLER endpoint to the larger, so every
    * triangle is generated by exactly one wedge at its smallest
    * corner and the per-node oriented out-degree is O(sqrt(m)); the
    * wedge self-join therefore touches sum(out_deg^2) = O(m^1.5)
    * rows worst-case instead of sum(deg^2), and the closing-edge
    * check is one more equi-join against the canonical edge set.
    */
  def triangleStats(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
    // canonical undirected edge set (a < b), deduped: repartition on
    // `a` BEFORE distinct (hashpartitioning(a) co-locates equal (a, b)
    // rows, so the dedup plans without its own (a, b) exchange) and the
    // output keeps the `a` partitioning the first degree join reuses
    val und = e0.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .repartition(col("a"))
      .distinct()
      .persist()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .persist()
    // orient by (deg, node) ascending
    val withDeg = und
      .join(deg.withColumnRenamed("node", "a")
        .withColumnRenamed("deg", "__da"), "a")
      .join(deg.withColumnRenamed("node", "b")
        .withColumnRenamed("deg", "__db"), "b")
    val oriented = withDeg.select(
      when(col("__da") < col("__db") ||
        (col("__da") === col("__db") && col("a") < col("b")),
        struct(col("a").as("s"), col("b").as("d")))
        .otherwise(struct(col("b").as("s"), col("a").as("d")))
        .as("e"))
      .select(col("e.s").as("s"), col("e.d").as("d"))
      .persist()
    // wedges at the smallest corner: two oriented edges out of s
    val w1 = oriented.select(col("s"), col("d").as("x"))
    val w2 = oriented.select(col("s"), col("d").as("y"))
    val wedgePairs = w1.join(w2, Seq("s")).filter(col("x") < col("y"))
    // close the wedge with the canonical (min, max) edge
    val closing = und.select(col("a").as("x"), col("b").as("y"))
    val nTriangles = wedgePairs.join(closing, Seq("x", "y"), "left_semi")
      .count()
    // the census row materializes WHILE the cached frames are hot;
    // the returned frame is then a pure literal (re-executions of the
    // caller's plan never recompute the graph)
    val r = deg.agg(
        count(lit(1)).as("n_nodes"),
        coalesce(sum(col("deg")) / 2, lit(0)).cast("long")
          .as("n_edges"),
        coalesce(sum(col("deg") * (col("deg") - 1) / 2), lit(0))
          .cast("long").as("n_wedges")).first()
    und.unpersist(blocking = false)
    deg.unpersist(blocking = false)
    oriented.unpersist(blocking = false)
    val (nNodes, nEdges, nWedges) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    edges.sparkSession.range(1).select(
      lit(nNodes).as("n_nodes"), lit(nEdges).as("n_edges"),
      lit(nWedges).as("n_wedges"), lit(nTriangles).as("n_triangles"),
      (if (nWedges > 0) lit(3.0 * nTriangles / nWedges)
       else lit(null).cast("double")).as("global_clustering"))
  }
}
