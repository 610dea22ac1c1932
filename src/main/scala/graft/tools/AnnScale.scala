package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible scale receipt for the ANN family
  * ([[graft.ops.Similarity.ivfTopK]] vs [[graft.ops.Similarity.bruteForceTopK]])
  * at corpus sizes the sf0.1 fixtures can't show: `n` synthetic vectors of
  * dimension `d` drawn around `nClusters` hash-derived cluster centers
  * (clustered geometry — the regime IVF's inverted lists exist for, and the
  * honest one: real embedding corpora cluster), `nQueries` of them replayed
  * as queries.
  *
  * Reports, as ONE JSON line: brute-force wall (the exact baseline — a
  * broadcast crossJoin whose per-partition top-k aggregate bounds what
  * crosses the exchange), IVF wall at (`nCentroids`, `nProbe`) INCLUDING
  * Lloyd training, and the mean recall@k of IVF against brute — the
  * speed-for-recall trade, measured, at 1M vectors.
  *
  *   sbt -batch "runMain graft.tools.AnnScale [n] [d] [k] [nQueries] [nCentroids] [nProbe]"
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val d = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val nQueries = args.lift(3).map(_.toInt).getOrElse(100)
    val nCentroids = args.lift(4).map(_.toInt).getOrElse(256)
    val nProbe = args.lift(5).map(_.toInt).getOrElse(16)
    require(nQueries > 0 && nQueries <= n,
      s"nQueries must be in [1, n]: got $nQueries of $n")
    val nClusters = 1024L
    val spark = SparkSession.builder()
      .appName("ann-scale")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hash-derived clustered vectors, row-local: center(cluster, j) in
    // [-1, 1) plus per-vector noise at 1/10 the center scale
    def u(h: org.apache.spark.sql.Column, m: Long) =
      pmod(xxhash64(h), lit(m)).cast("double") / m.toDouble
    val vecs = spark.range(n).select(col("id"),
      array((0 until d).map { j =>
        val cl = pmod(col("id"), lit(nClusters))
        ((u(cl * d + lit(j.toLong), 100000L) * 2.0 - 1.0) +
          (u(col("id") * d + lit(j.toLong + 7919L), 100000L) - 0.5) * 0.2)
          .cast("float")
      }: _*).as("emb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vecs.count() // materialize OUTSIDE timing: both paths read the cache
    val queries = vecs.filter(pmod(col("id"), lit(n / nQueries)) === 0L)

    def timed(f: => DataFrame): (DataFrame, Double) = {
      val t0 = System.nanoTime()
      val df = f
      val materialized = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      materialized.count()
      (materialized, (System.nanoTime() - t0) / 1e9)
    }

    val (exact, bruteSec) = timed(graft.ops.Similarity.bruteForceTopK(
      vecs, queries, "id", "emb", k))
    val (approx, ivfSec) = timed(graft.ops.Similarity.ivfTopK(
      vecs, queries, "id", "emb", k,
      nCentroids = nCentroids, nProbe = nProbe, iterations = 2))
    val recall = graft.ops.Similarity.recallAtK(approx, exact)
      .agg(avg(col("recall"))).first().getDouble(0)

    println(
      s"""{"metric":"ann_scale","n":$n,"d":$d,"k":$k,""" +
      s""""n_queries":$nQueries,"n_centroids":$nCentroids,""" +
      s""""n_probe":$nProbe,""" +
      f""""brute_sec":$bruteSec%.1f,"ivf_sec":$ivfSec%.1f,""" +
      f""""speedup":${bruteSec / ivfSec}%.2f,""" +
      f""""recall_at_k":$recall%.4f}""")
    spark.stop()
  }
}
