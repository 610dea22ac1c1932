package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible scale receipt for label propagation
  * ([[graft.ops.Graph.labelPropagationReleasable]]) — the
  * [[GraphScale]] pattern applied to community detection: `m` random
  * background edges (default 10,000,000) over an isolated node range,
  * plus TWO planted star communities of `starSize` members each whose
  * hubs carry the smallest ids in their stars, so the receipt can
  * assert the op actually detects communities: with the self-vote +
  * smallest-label tie rule, every star converges to its hub's label in
  * ONE iteration (member cells tie {hub-label: 1, self: 1} → min;
  * the hub's cells all tie at 1 → its own smallest label) and must
  * come back EXACTLY after 3.
  *
  * The scale claim measured here is Graph.scala's: the symmetrized
  * edge set shuffles once (the prologue), and each iteration moves
  * only the (node, label) CELL stream — bounded by the edge count,
  * never by nodes x labels. A task-end listener records per-stage
  * shuffle-write records; the largest stage is printed so two m
  * points show the iteration cost scaling linearly in m (LPA is
  * edge-bound per iteration, unlike PageRank's rank-bound exchanges).
  *
  *   sbt -batch "runMain graft.tools.LpaScale [m] [n] [starSize]"
  */
object LpaScale {
  private def mix(i: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29
    x & Long.MaxValue
  }

  def main(args: Array[String]): Unit = {
    val m = args.headOption.map(_.toLong).getOrElse(10000000L)
    val n = args.lift(1).map(_.toLong).getOrElse(200000L)
    val starSize = args.lift(2).map(_.toLong).getOrElse(5000L)
    val hubA = 0L
    val hubB = 1000000L
    val bg = 2000000L // background node range base — disjoint from stars
    val spark = SparkSession.builder()
      .appName("lpa-scale")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val stageSum = scala.collection.concurrent.TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val mt = te.taskMetrics
        if (mt != null && mt.shuffleWriteMetrics != null) {
          val rec = mt.shuffleWriteMetrics.recordsWritten
          if (rec > 0) stageSum.updateWith(te.stageId) {
            case Some(s) => Some(s + rec); case None => Some(rec)
          }
        }
      }
    })
    try {
      val background = spark.range(m).as[Long].map { i =>
        (bg + mix(i) % n, bg + mix(i + 0x5DEECE66DL) % n)
      }.toDF("src", "dst")
      val stars = spark.range(starSize).as[Long]
        .flatMap(i => Seq((hubA, hubA + 1 + i), (hubB, hubB + 1 + i)))
        .toDF("src", "dst")
      val edges = background.unionAll(stars)

      val t0 = System.nanoTime()
      val (labels, release) = graft.ops.Graph.labelPropagationReleasable(
        edges, "src", "dst", iterations = 3)
      val rec = labels.agg(
        sum(when(col("node") >= hubA && col("node") <= hubA + starSize &&
          col("label") === hubA, 1L).otherwise(0L)).as("a"),
        sum(when(col("node") >= hubB && col("node") <= hubB + starSize &&
          col("label") === hubB, 1L).otherwise(0L)).as("b")).first()
      val sec = (System.nanoTime() - t0) / 1e9
      release()

      val want = starSize + 1 // members + the hub itself
      val maxStage = stageSum.values.foldLeft(0L)(math.max)
      println(
        s"""{"m":$m,"n_background_nodes":$n,"star_size":$starSize,""" +
          f""""iterations":3,"wall_sec":$sec%.1f,""" +
          s""""star_a_recovered":${rec.getLong(0)},""" +
          s""""star_b_recovered":${rec.getLong(1)},""" +
          s""""star_expected":$want,""" +
          s""""max_stage_shuffle_records":$maxStage}""")
    } finally spark.stop()
  }
}
