package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible scale receipt for the text-dedup flagship
  * ([[graft.ops.Dedup.minHashLshPairsReleasable]]) — the
  * [[MihScale]] pattern applied to MinHash LSH: N synthetic documents
  * (default 1,000,000) with
  *
  *  - `nPlanted` near-duplicate pairs (one mid-document token edit:
  *    3-shingle Jaccard ~0.85, so every pair must surface through the
  *    16x4 banding with near-certainty), and
  *  - ONE planted mega-bucket: `megaSize` documents with IDENTICAL
  *    text (`megaSize` > the 1000-id salt target, below the 10k
  *    bucket cap), so the salted block-join branch engages and its
  *    straggler claim is measured at scale, not just in
  *    CappedBucketPairsSpec's 10k-row fixture.
  *
  * A task-end listener records per-task shuffle WRITE records; the
  * stage with the largest record total is the in-bucket pair
  * generation feeding the cross-band dedupe, and its max-task share
  * is the receipt that no single task owned the mega-bucket's pairs.
  * Prints ONE JSON line: wall seconds, pair counts, planted recall,
  * mega-pair exactness, and the max-task pair share.
  *
  *   sbt -batch "runMain graft.tools.DedupScale [n] [planted] [mega]"
  */
object DedupScale {
  private def mix(i: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29
    x
  }

  /** Deterministic ~40-token document; vocabulary 2^19 so shingles are
    * effectively unique per document (uniform-random worst case for
    * bucket sparsity — real corpora cluster).
    */
  private def docText(id: Long, editAt: Int): String = {
    val sb = new StringBuilder(400)
    var j = 0
    while (j < 40) {
      if (j > 0) sb.append(' ')
      if (j == editAt) sb.append("edited")
      else sb.append("tok").append(java.lang.Long.toHexString(
        mix(id * 40 + j) & ((1L << 19) - 1)))
      j += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nPlanted = args.lift(1).map(_.toInt).getOrElse(1000)
    val megaSize = args.lift(2).map(_.toInt).getOrElse(1500)
    val spark = SparkSession.builder()
      .appName("dedup-scale")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    // per-stage shuffle-write record totals and per-task maxima: the
    // straggler meter. TrieMap: listener events arrive on the listener
    // bus thread while the query runs on others.
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
      val base = spark.range(n.toLong).as[Long]
        .map(id => (id, docText(id, editAt = -1)))
        .toDF("doc_id", "text")
      val planted = spark.range(nPlanted.toLong).as[Long]
        .map(i => (n.toLong + i, docText(i, editAt = 20)))
        .toDF("doc_id", "text")
      val mega = spark.range(megaSize.toLong).as[Long]
        .map(i => (2L * n + i,
          "mega bucket boilerplate page " +
            "cookie banner navigation footer copyright terms privacy " +
            "subscribe newsletter contact about careers press blog help"))
        .toDF("doc_id", "text")
      val docs = base.unionAll(planted).unionAll(mega)
      val t0 = System.nanoTime()
      val (pairs, release) = graft.ops.Dedup.minHashLshPairsReleasable(
        docs, "doc_id", "text", numHashes = 64, bands = 16, shingleK = 3,
        maxBucketSize = 10000)
      val agg = pairs.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("id_b") === col("id_a") + n.toLong &&
          col("id_a") < n.toLong, 1L).otherwise(0L))
          .as("planted_recovered"),
        sum(when(col("id_a") >= 2L * n && col("id_b") >= 2L * n, 1L)
          .otherwise(0L)).as("mega_pairs")).first()
      val sec = (System.nanoTime() - t0) / 1e9
      release()
      val megaExpected = megaSize.toLong * (megaSize - 1) / 2
      // the pair-generation stage is the one writing the most shuffle
      // records (the 16x-band mega pairs dwarf every other exchange)
      val (pairStage, pairTotal) =
        if (stageSum.isEmpty) (-1, 0L) else stageSum.maxBy(_._2)
      val maxShare =
        if (pairTotal == 0L) 0.0
        else stageMax.getOrElse(pairStage, 0L).toDouble / pairTotal
      println(
        s"""{"n":$n,"planted":$nPlanted,"mega_size":$megaSize,""" +
          f""""wall_sec":$sec%.1f,"pairs":${agg.getLong(0)},""" +
          s""""planted_recovered":${agg.getLong(1)},""" +
          s""""mega_pairs":${agg.getLong(2)},""" +
          s""""mega_expected":$megaExpected,""" +
          f""""max_task_pair_share":$maxShare%.4f,""" +
          s""""pair_stage_records":$pairTotal}""")
    } finally spark.stop()
  }
}
