package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible scale receipt for the blocked edit-distance join
  * ([[graft.ops.Joins.fuzzyJoin]]) — the [[DedupScale]] pattern applied
  * to record linkage: `n` synthetic names PER SIDE (default 1,000,000)
  * with `nPlanted` true pairs planted as one mid-name character
  * substitution (edit distance exactly 1, beyond the prefix region, so
  * the default symmetric-prefix blocking must recover every pair), and
  * every other cross-side name pair far apart (distinct random
  * suffixes), so the expected output is EXACTLY the planted pairs.
  *
  * Names draw their first `prefixLen` characters and their length band
  * uniformly, the realistic blocking regime (the bench row deliberately
  * measures the degenerate shared-prefix worst case instead); the
  * receipt asserts exact recovery, zero false pairs, and meters the
  * per-stage shuffle records — the scaladoc's scale claim is that only
  * SKINNY BLOCK ROWS ever cross an exchange (candidate pairs are
  * generated and scored inside the join, map-side), so the high-water
  * stage must be O(n) block rows, never O(candidate pairs), and its
  * max-task share bounds the blocking skew. Prints ONE JSON line.
  *
  *   sbt -batch "runMain graft.tools.FuzzyJoinScale [n] [planted]"
  */
object FuzzyJoinScale {
  private def mix(i: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29
    x
  }

  private val Alpha = "abcdefghijklmnopqrstuvwxyz0123456789"

  /** Deterministic name: 2 uniform prefix chars + 10..25 uniform body
    * chars (length varies the (maxDist+1)-wide band), vocabulary 36 —
    * two distinct ids collide within edit distance 1 with probability
    * ~0 at any receipt size.
    */
  private def name(id: Long): String = {
    val h = mix(id)
    val len = 12 + (mix(h) & 15L).toInt // 12..27 total
    val sb = new StringBuilder(len)
    var j = 0
    var s = h
    while (j < len) {
      s = mix(s)
      sb.append(Alpha((s & 0x7fffffffL).toInt % Alpha.length))
      j += 1
    }
    sb.toString
  }

  /** One substitution at position 5 (inside every name, beyond the
    * 2-char prefix and the symmetric dropped-prefix region).
    */
  private def edited(id: Long): String = {
    val s = name(id).toCharArray
    s(5) = if (s(5) == 'q') 'z' else 'q'
    new String(s)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nPlanted = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .appName("fuzzy-join-scale")
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
      val left = spark.range(n.toLong).as[Long]
        .map(id => (id, name(id))).toDF("id", "name")
      // right side: the first nPlanted ids carry an edited copy of the
      // SAME id's left name (the true pairs); the rest are fresh names
      // from a disjoint id range (no accidental matches)
      val right = spark.range(n.toLong).as[Long]
        .map(id => (id,
          if (id < nPlanted) edited(id) else name(2L * n + id)))
        .toDF("id", "name")
      val t0 = System.nanoTime()
      val pairs = graft.ops.Joins.fuzzyJoin(left, right, "id", "name",
        maxDist = 1, prefixLen = 2)
      val agg = pairs.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("left_id") === col("right_id") &&
          col("left_id") < nPlanted.toLong && col("dist") === 1, 1L)
          .otherwise(0L)).as("planted_recovered")).first()
      val sec = (System.nanoTime() - t0) / 1e9
      val (hiStage, hiTotal) =
        if (stageSum.isEmpty) (-1, 0L) else stageSum.maxBy(_._2)
      val maxShare =
        if (hiTotal == 0L) 0.0
        else stageMax.getOrElse(hiStage, 0L).toDouble / hiTotal
      // receipt invariants: exact recovery, nothing else matches, and
      // the high-water exchange is block-row-sized (O(n)), never
      // candidate-pair-sized
      val ok = agg.getLong(1) == nPlanted.toLong &&
        agg.getLong(0) == nPlanted.toLong &&
        hiTotal < 8L * n
      println(
        s"""{"n_per_side":$n,"planted":$nPlanted,""" +
          f""""wall_sec":$sec%.1f,"pairs":${agg.getLong(0)},""" +
          s""""planted_recovered":${agg.getLong(1)},""" +
          s""""hi_stage_records":$hiTotal,""" +
          f""""max_task_share":$maxShare%.4f,"ok":$ok}""")
    } finally spark.stop()
  }
}
