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
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: Option[String] = None,
      iterations: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val w = weightCol.map(c => col(c).cast("double")).getOrElse(lit(1.0))
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull && w > 0)
      .groupBy(col(srcCol).as("src"), col(dstCol).as("dst"))
      .agg(sum(w).as("w"))
    // Per-source transition probability folded into the edge weight so
    // the iteration join is a plain multiply; partitioned on src (the
    // join key every iteration reuses) and persisted.
    val outW = e0.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val norm = e0.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("ow")).as("p"))
      .repartition(col("src"))
      .persist()
    val nodes = norm.select(col("src").as("node"))
      .union(norm.select(col("dst").as("node")))
      .distinct()
      .repartition(col("node"))
      .persist()
    val n = nodes.count().toDouble
    val dangling = nodes.join(
      norm.select(col("src").as("node")).distinct(),
      Seq("node"), "left_anti").persist()

    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank")).persist()
    ranks.count()
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
    val out = ranks.select(col("node"), col("rank"),
      (col("rank") * n).as("scaled_rank"))
    norm.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    dangling.unpersist(blocking = false)
    out
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
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = e0.union(e0.select(col("dst").as("src"),
        col("src").as("dst")))
      .distinct()
      .repartition(col("src"))
      .persist()
    val nodes = und.select(col("src").as("node")).distinct()
      .union(edges.filter(col(srcCol).isNotNull)
        .select(col(srcCol).as("node")))
      .union(edges.filter(col(dstCol).isNotNull)
        .select(col(dstCol).as("node")))
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
      // argmax label by (count desc, label asc): a row_number window
      // over the (node, label) CELL table — bounded by distinct
      // neighbor labels, not edges — keeps the tie order type-generic
      // (numeric or string labels alike)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node"))
        .orderBy(col("__c").desc, col("label").asc)
      val best = neighborLabels
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("node"), col("label").as("__new"))
      val next = nodes.join(best, Seq("node"), "left")
        .join(labels, Seq("node"))
        .select(col("node"),
          coalesce(col("__new"), col("label")).as("label"))
        .persist()
      next.count()
      labels.unpersist(blocking = false)
      labels = next
    }
    und.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    labels
  }

}
