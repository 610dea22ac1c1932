package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Multi-index-hashing regime of [[Media.bandedHammingPairsReleasable]]:
  * exact recall at radii 4..15 via pigeonhole probe expansion over
  * 4 x 16-bit substrings — routed == brute on corpora with planted
  * near-misses clustered exactly AT and just OVER each radius (the
  * boundary cases banding gets wrong when bands are mis-sized).
  */
class MihHammingSpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  /** Deterministic 64-bit "random" hash. */
  private def mix(i: Long): Long = {
    var x = i * 0x9E3779B97F4A7C15L
    x ^= x >>> 32; x *= 0xBF58476D1CE4E5B9L; x ^= x >>> 29
    x
  }

  /** Flip exactly `k` distinct bit positions of `h`, chosen by seed. */
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

  private def bruteWithin(vals: Seq[(Long, Long)], r: Int) =
    (for {
      (ia, ha) <- vals; (ib, hb) <- vals if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= r
    } yield (ia, ib) -> d).toMap

  for (radius <- Seq(4, 7, 11, 15)) {
    test(s"MIH routed pair set equals brute force at radius $radius " +
      "with planted copies AT the radius and misses just over it") {
      import spark.implicits._
      val rPrime = radius / 4
      // 200 well-separated base hashes; for each of the first 30, a
      // copy at EXACTLY the radius (must pair) and one at radius+1
      // (must not) — plus one adversarial pair whose distance is
      // concentrated in a single band (distance rPrime+? in one band,
      // 0 in the rest), the worst case for pigeonhole banding.
      val base = (0L until 200L).map(i => (i, mix(i)))
      val at = (0L until 30L).map(i =>
        (1000L + i, flip(mix(i), radius, seed = i + 1)))
      val over = (0L until 30L).map(i =>
        (2000L + i, flip(mix(i), radius + 1, seed = 7 * i + 3)))
      // all `radius` flipped bits inside band 2 (bits 32..47) when
      // they fit, else spread minimally outside
      val inBand = (0L until 10L).map { i =>
        val h = mix(500L + i)
        val flips = math.min(radius, 16)
        var out = h
        for (b <- 0 until flips) out ^= 1L << (32 + b)
        (3000L + i, out) -> (3100L + i, h)
      }
      val vals = base ++ at ++ over ++
        inBand.flatMap { case (a, b) => Seq(a, b) }
      val df = vals.toDF("id", "h")
      val (routed, release) = Media.bandedHammingPairsReleasable(
        df, maxHamming = radius, maxBucketSize = 10000)
      val got = try {
        routed.collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      } finally release()
      got shouldBe bruteWithin(vals, radius)
      // the planted at-radius copies are all recovered
      for (i <- 0L until 30L)
        got.get((i, 1000L + i)) shouldBe Some(radius)
    }
  }

  test("property: routed == brute on SEEDED RANDOM corpora with " +
    "planted clusters at random radii across the full MIH range") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x15AL)
    for (_ <- 1 to 6) {
      val radius = rnd.nextInt(16) // 0..15 — exercises r'=0..3
      val n = 30 + rnd.nextInt(170)
      val base = (0L until n.toLong).map(i => (i, rnd.nextLong()))
      // planted cluster: perturbations of one hash at random distances
      val clustered = (0 until 10).map { j =>
        (10000L + j,
          flip(base.head._2, rnd.nextInt(radius + 4), seed = j + 17))
      }
      val vals = base ++ clustered
      val (routed, release) = Media.bandedHammingPairsReleasable(
        vals.toDF("id", "h"), radius, maxBucketSize = 10000)
      val got = try {
        routed.collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      } finally release()
      withClue(s"radius=$radius n=${vals.size}: ") {
        got shouldBe bruteWithin(vals, radius)
      }
    }
  }

  test("probe-delta sets have the exact pigeonhole cardinalities " +
    "(1 + C(16,1) [+ C(16,2) [+ C(16,3)]])") {
    Media.mihProbeDeltas(0).length shouldBe 1
    Media.mihProbeDeltas(1).length shouldBe 17
    Media.mihProbeDeltas(2).length shouldBe 137
    Media.mihProbeDeltas(3).length shouldBe 697
    // every delta fits in 16 bits with popcount <= rPrime
    for (rp <- 0 to 3; d <- Media.mihProbeDeltas(rp)) {
      (d & ~0xffffL) shouldBe 0L
      java.lang.Long.bitCount(d) should be <= rp
    }
  }
}
