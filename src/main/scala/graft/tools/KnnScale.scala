package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible scale receipt for the kNN label-noise screen
  * ([[graft.ops.Similarity.knnLabelNoise]]) routed through ivfTopK —
  * the [[DedupScale]] pattern: `n` synthetic embeddings (default
  * 1,000,000, 8-d) in 16 WELL-SEPARATED clusters (distinct +/- axis
  * directions, cosine across clusters <= 0), labels equal to the
  * cluster id except `nNoise` planted rows labeled with the NEXT
  * cluster's id. Every planted row's neighbors carry the true cluster
  * label, so the screen must flag EXACTLY the planted rows.
  *
  * The receipt asserts exact noise recovery (suspects == planted, zero
  * false flags) and meters per-stage shuffle records: the corpus never
  * crosses an exchange raw — the inverted lists stream map-side against
  * broadcast probes and only the bounded per-(query, partition) top-k
  * partials plus the (query, label) cells shuffle, so the high-water
  * stage must be O(partitions x n) records, never O(candidate pairs).
  * Prints ONE JSON line.
  *
  *   sbt -batch "runMain graft.tools.KnnScale [n] [noise] [nCentroids] [nProbe]"
  */
object KnnScale {
  private def mix(i: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29
    x
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nNoise = args.lift(1).map(_.toInt).getOrElse(500)
    val nCentroids = args.lift(2).map(_.toInt).getOrElse(512)
    val nProbe = args.lift(3).map(_.toInt).getOrElse(1)
    val nClusters = 16
    val d = 8
    val spark = SparkSession.builder()
      .appName("knn-scale")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val stageSum = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val stageMax = scala.collection.concurrent.TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null && m.shuffleWriteMetrics != null) {
          val rec = m.shuffleWriteMetrics.recordsWritten
          if (rec > 0) {
            stageSum.updateWith(te.stageId) {
              case Some(s) => Some(s + rec); case None => Some(rec) }
            stageMax.updateWith(te.stageId) {
              case Some(s) => Some(math.max(s, rec)); case None => Some(rec) }
          }
        }
      }
    })
    try {
      // cluster c -> +/- axis direction (c%8, sign by c/8) plus tiny
      // deterministic jitter: cosine within a cluster ~1, across <= ~0
      val rows = spark.range(n.toLong).as[Long].map { id =>
        val c = (id % nClusters).toInt
        val axis = c % d
        val sign = if (c < d) 1.0 else -1.0
        val v = Array.tabulate(d) { j =>
          val jitter = ((mix(id * d + j) & 0xffffL).toDouble / 65536.0
            - 0.5) * 0.05
          (if (j == axis) sign else 0.0) + jitter
        }
        val label =
          if (id < nNoise.toLong) ((c + 1) % nClusters).toString
          else c.toString
        (id, v, label)
      }.toDF("id", "emb", "label")
      val t0 = System.nanoTime()
      val report = graft.ops.Similarity.knnLabelNoise(rows, "id", "emb",
        "label", k = 10, bruteForceThreshold = 20000L,
        nCentroids = nCentroids, nProbe = nProbe)
      val agg = report.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("suspect"), 1L).otherwise(0L)).as("n_suspect"),
        sum(when(col("suspect") && col("query_id") < nNoise.toLong, 1L)
          .otherwise(0L)).as("noise_recovered")).first()
      val sec = (System.nanoTime() - t0) / 1e9
      val (hiStage, hiTotal) =
        if (stageSum.isEmpty) (-1, 0L) else stageSum.maxBy(_._2)
      val maxShare =
        if (hiTotal == 0L) 0.0
        else stageMax.getOrElse(hiStage, 0L).toDouble / hiTotal
      val cores = spark.sparkContext.defaultParallelism.toLong
      // invariants: exact recovery, zero false flags, and the
      // high-water exchange bounded by partitions x n (the top-k
      // partial / label-cell streams), never the candidate pairs
      val ok = agg.getLong(2) == nNoise.toLong &&
        agg.getLong(1) == nNoise.toLong &&
        hiTotal <= 2L * cores * n
      println(
        s"""{"n":$n,"noise":$nNoise,"n_centroids":$nCentroids,""" +
          s""""n_probe":$nProbe,""" +
          f""""wall_sec":$sec%.1f,"rows":${agg.getLong(0)},""" +
          s""""suspects":${agg.getLong(1)},""" +
          s""""noise_recovered":${agg.getLong(2)},""" +
          s""""hi_stage_records":$hiTotal,""" +
          f""""max_task_share":$maxShare%.4f,"ok":$ok}""")
    } finally spark.stop()
  }
}
