package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>` / `array<double>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast;
  *    the corpus streams through one codegen'd stage — the right baseline
  *    even at 100 TB when the query set is small (no shuffle of the corpus).
  *  - [[ivfTopK]]: IVF-style pruning — corpus is pre-assigned to the
  *    nearest of k centroid vectors; a query only scans its nProbe closest
  *    inverted lists. Centroid assignment is one broadcast join; the scan
  *    cost drops by ~k/nProbe.
  * Plus random-hyperplane LSH bucketing used by [[Dedup.embeddingNearDups]].
  */
object Similarity {

  /** Elementwise dot product of two array columns, computed in double with
    * left-to-right accumulation (deterministic, matches a sequential SQL
    * evaluation of the same expression). Backed by the codegen'd
    * [[graft.functions.VecDot]] expression — a fused loop inside
    * whole-stage codegen, not an interpreted higher-order function.
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

  /** Embedding dimensionality, read from the first row. */
  def dim(df: DataFrame, embCol: String): Int =
    df.select(size(col(embCol))).first().getInt(0)

  /** Deterministic random hyperplanes (fixed seed — reproducible runs). */
  def randomPlanes(nPlanes: Int, dims: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dims)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of an embedding under the given hyperplanes. */
  def hyperplaneBucket(emb: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = dot(emb, array(p.map(lit): _*))
      when(proj > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Exact cosine top-k neighbors for each query row.
    *
    * `queries` is expected to be small (it is broadcast); the corpus side
    * never shuffles — the join is a BroadcastNestedLoopJoin feeding a
    * partial top-k window.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("item_id"), col(embCol).as("item_emb"))
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("query_emb"))
    val joined = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("item_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("item_id"),
        cosine(col("query_emb"), col("item_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-pruned approximate top-k: assign corpus rows to their nearest
    * centroid (broadcast), then answer each query by scanning only its
    * nProbe nearest inverted lists.
    *
    * Centroids: deterministic sample (first nCentroids by id) refined by
    * `iterations` Lloyd steps — all DataFrame ops, no collect of the corpus
    * (only the centroids, which are tiny, come back to the driver).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4,
      iterations: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val c = corpus.select(col(idCol).as("item_id"),
      transform(col(embCol), x => x.cast("double")).as("item_emb"))

    // init: first nCentroids items by id (deterministic)
    var centroids: Seq[(Int, Seq[Double])] = c.orderBy(col("item_id"))
      .limit(nCentroids).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq

    def centroidDf = centroids.toDF("centroid_id", "centroid")

    // Lloyd refinement: assign -> mean per centroid
    (0 until iterations).foreach { _ =>
      val assigned = assignNearest(c, centroidDf)
      val refined = assigned
        .select(col("centroid_id"), posexplode(col("item_emb")).as(Seq("pos", "v")))
        .groupBy("centroid_id", "pos").agg(avg("v").as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"), transform(col("pm"), x => x("m")).as("centroid"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
      if (refined.nonEmpty)
        centroids = refined.toSeq ++
          centroids.filterNot(cc => refined.exists(_._1 == cc._1))
    }

    val inverted = assignNearest(c, centroidDf)

    // query -> nProbe nearest centroids
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(embCol), x => x.cast("double")).as("query_emb"))
    val qc = q.crossJoin(broadcast(centroidDf))
      .select(col("query_id"), col("query_emb"), col("centroid_id"),
        cosine(col("query_emb"), col("centroid")).as("csim"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    val probes = qc.withColumn("r", row_number().over(wq))
      .filter(col("r") <= nProbe)
      .select(col("query_id"), col("query_emb"), col("centroid_id"))

    val candidates = probes.join(inverted, Seq("centroid_id"))
      .filter(col("item_id") =!= col("query_id"))
      .select(col("query_id"), col("item_id"),
        cosine(col("query_emb"), col("item_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("item_id").asc)
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private def assignNearest(c: DataFrame, centroidDf: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("item_id"))
      .orderBy(col("csim").desc, col("centroid_id").asc)
    c.crossJoin(broadcast(centroidDf))
      .select(col("item_id"), col("item_emb"), col("centroid_id"),
        cosine(col("item_emb"), col("centroid")).as("csim"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select(col("item_id"), col("item_emb"), col("centroid_id"))
  }
}
