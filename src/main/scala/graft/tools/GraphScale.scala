package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible scale receipt for the graph-centrality flagship
  * ([[graft.ops.Graph.pageRankReleasable]]) — the [[DedupScale]]
  * pattern applied to PageRank: `m` synthetic edges (default
  * 10,000,000) over `n` nodes (default 200,000 — avg degree 50, the
  * dense regime where the rank-sized-exchange claim bites) with ONE planted
  * hub that receives every 20th edge (~5% of all in-edges, ~10^5x the
  * uniform in-degree), so the receipt can assert the op actually
  * ranks: the hub must come back as the single highest-rank node by a
  * wide margin.
  *
  * The scale CLAIM measured here is the one in Graph.scala's header:
  * the edge table is normalized and shuffled ONCE, and every
  * iteration's exchanges are RANK-sized — map-side combine bounds an
  * iteration stage's shuffle records by partitions x n, INDEPENDENT OF
  * m (the edge-sized rows never ride an iteration exchange). A
  * task-end listener records per-stage shuffle-write record totals;
  * stages above the partitions x n bound can only be the one-time
  * normalization prologue (counted), and the largest remaining stage
  * is the per-iteration high-water mark — run two m points at fixed n
  * and that number stays FLAT while the prologue scales with m.
  *
  * Prints ONE JSON line: wall seconds, node/edge counts, hub rank and
  * margin, prologue stage count, the iteration-stage high-water mark,
  * and its bound. Doubles as the fresh-JVM environment for the graph
  * bench-honesty cross-check (r16 verdict #1).
  *
  *   sbt -batch "runMain graft.tools.GraphScale [m] [n] [iters]"
  */
object GraphScale {
  private def mix(i: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29
    x & Long.MaxValue
  }

  def main(args: Array[String]): Unit = {
    val m = args.headOption.map(_.toLong).getOrElse(10000000L)
    val n = args.lift(1).map(_.toLong).getOrElse(200000L)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val hub = 0L
    val spark = SparkSession.builder()
      .appName("graph-scale")
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
      // edges: uniform-random src; every 20th edge points at the hub,
      // the rest at a uniform-random dst. Deterministic (hash-mixed).
      val edges = spark.range(m).as[Long].map { i =>
        val src = mix(i) % n
        val dst = if (i % 20 == 0) hub else mix(i + 0x5DEECE66DL) % n
        (src, dst)
      }.toDF("src", "dst")

      val t0 = System.nanoTime()
      val (ranks, release) = graft.ops.Graph.pageRankReleasable(
        edges, "src", "dst", None, iterations = iters)
      val top = ranks.orderBy(col("rank").desc).limit(2)
        .select(col("node"), col("scaled_rank")).collect()
      val nNodes = ranks.count()
      val sec = (System.nanoTime() - t0) / 1e9
      release()

      val hubFirst = top.headOption.exists(_.getLong(0) == hub)
      val margin =
        if (top.length == 2 && top(1).getDouble(1) > 0)
          top(0).getDouble(1) / top(1).getDouble(1)
        else -1.0
      // map-side combine bounds any iteration exchange by
      // partitions x n records; only the one-time normalization
      // prologue may exceed it
      val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val bound = parts.toLong * nNodes
      val prologue = stageSum.values.count(_ > bound)
      val iterMax = stageSum.values.filter(_ <= bound)
        .foldLeft(0L)(math.max)
      println(
        s"""{"m":$m,"n_nodes":$nNodes,"iterations":$iters,""" +
          f""""wall_sec":$sec%.1f,"hub_is_top":$hubFirst,""" +
          f""""hub_margin":$margin%.1f,""" +
          s""""hub_scaled_rank":${top.headOption.map(_.getDouble(1)).getOrElse(-1.0)},""" +
          s""""prologue_stages_over_bound":$prologue,""" +
          s""""iteration_stage_max_records":$iterMax,""" +
          s""""rank_bound_partitions_x_n":$bound}""")
    } finally spark.stop()
  }
}
