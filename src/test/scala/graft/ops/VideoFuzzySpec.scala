package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Radius-tolerant video dedup ([[Media.videoNearDupsFuzzy]]): frame
  * hashes that DRIFT a few bits (re-encoded copies) still pair, where
  * the exact-match join ([[Media.videoNearDups]]) requires identical
  * hashes. Expectations are brute-forced from the actual frame hashes,
  * so the spec pins routed == brute rather than guessing drift.
  */
class VideoFuzzySpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  /** A frame with texture (so aHash bits are decided) and an optional
    * dark patch whose size perturbs a few aHash bits deterministically.
    */
  private def frame(id: Long, f: Int, patch: Int): Array[Byte] = {
    val w = 32; val h = 24
    val px = Array.tabulate(w * h * 3) { i =>
      val p = i / 3; val x = p % w; val y = p / w
      (((id * 7 + f * 13 + 3 * x * x / (y + 1) + 5 * y) % 256)).toByte
    }
    var y = 0
    while (y < patch) {
      var x = 0
      while (x < patch) {
        val p = (y * w + x) * 3
        px(p) = 0; px(p + 1) = 0; px(p + 2) = 0
        x += 1
      }
      y += 1
    }
    Media.encodePpm(Media.PpmImage(w, h, px))
  }

  private def gvid(id: Long, patch: Int, n: Int): Array[Byte] =
    Media.encodeGvid(4000, (0 until n).map(f => frame(id, f, patch)))

  test("fuzzy pair set equals brute force over the real frame hashes; " +
    "drifted copies pair where the exact join misses them") {
    import spark.implicits._
    // clip k and clip k+100 share content with a small patch
    // perturbation; clip 50 is unrelated
    val clips = (0L until 4L).flatMap(k =>
      Seq((k, gvid(k, 0, 5)), (k + 100L, gvid(k, 6, 5)))) :+
      ((50L, gvid(999L, 0, 5)))
    val df = clips.toDF("id", "blob")
    val radius = 6
    val got = Media.videoNearDupsFuzzy(df, "id", "blob",
      maxHamming = radius, minSharedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // brute force over the per-clip DISTINCT frame hashes
    val hashes = clips.map { case (id, blob) =>
      id -> Media.gvidFrames(blob)
        .map(f => Media.aHash64(Media.decodePpm(f._2))).toVector.distinct
    }.toMap
    val brute = (for {
      (ca, ha) <- hashes.toSeq; (cb, hb) <- hashes.toSeq if ca < cb
      n = (for (a <- ha; b <- hb
        if java.lang.Long.bitCount(a ^ b) <= radius) yield 1).size
      if n >= 2
    } yield (ca, cb) -> n.toLong).toMap
    got shouldBe brute
    // the perturbed copies are within reach of the fuzzy join on this
    // fixture (sanity of the scenario itself)...
    for (k <- 0L until 4L)
      assert(got.contains((k, k + 100L)),
        s"perturbed copy of clip $k not recovered: $got")
    // ...and the exact-match join misses at least some of them (the
    // drift is real, not zero)
    val exact = Media.videoNearDups(df, "id", "blob",
      minSharedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missedByExact = (0L until 4L).count(k => !exact.contains((k, k + 100L)))
    missedByExact should be > 0
  }
}
