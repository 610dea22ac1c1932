package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reproducible scale receipt for the multi-index-hashing Hamming
  * join: N synthetic 64-bit hashes (default 1,000,000) with planted
  * near-duplicates at the requested radius (default 10 — the
  * JPEG-recompression regime that REFUSED past 100k hashes before
  * r15), routed through the production engine
  * ([[graft.ops.Media.bandedHammingPairsReleasable]] via
  * simHash-equivalent (id, h) input). Prints wall seconds, pair
  * counts, and planted recall as ONE JSON line.
  *
  *   sbt -batch "runMain graft.tools.MihScale [n] [radius] [planted]"
  */
object MihScale {
  private def mix(i: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29
    x
  }

  private def flip(h: Long, k: Int, seed: Long): Long = {
    var out = h
    var chosen = Set.empty[Int]
    var s = seed
    while (chosen.size < k) {
      s = mix(s)
      val pos = (s & 63L).toInt
      if (!chosen.contains(pos)) { chosen += pos; out ^= 1L << pos }
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val radius = args.lift(1).map(_.toInt).getOrElse(10)
    val nPlanted = args.lift(2).map(_.toInt).getOrElse(1000)
    val spark = SparkSession.builder()
      .appName("mih-scale")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    try {
      // base corpus: uniform-random hashes (the WORST case for bucket
      // sparsity claims — real perceptual hashes cluster); planted
      // copies flipped at exactly `radius` bits
      val base = spark.range(n.toLong)
        .select(col("id"), expr("id").as("seed"))
        .as[(Long, Long)]
        .map { case (id, seed) => (id, mix(seed)) }
        .toDF("id", "h")
      val planted = spark.range(nPlanted.toLong)
        .as[Long]
        .map(i => (n.toLong + i, flip(mix(i), radius, seed = 7 * i + 3)))
        .toDF("id", "h")
      val hashes = base.unionAll(planted)
      val t0 = System.nanoTime()
      val (pairs, release) = graft.ops.Media
        .bandedHammingPairsReleasable(hashes, radius,
          maxBucketSize = 10000)
      val agg = pairs.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("id_b") === col("id_a") + n.toLong &&
          col("hamming") === radius, 1L).otherwise(0L))
          .as("n_planted_recovered")).first()
      val sec = (System.nanoTime() - t0) / 1e9
      release()
      println(
        s"""{"n":$n,"radius":$radius,"planted":$nPlanted,""" +
          f""""wall_sec":$sec%.1f,"pairs":${agg.getLong(0)},""" +
          s""""planted_recovered":${agg.getLong(1)}}""")
    } finally spark.stop()
  }
}
