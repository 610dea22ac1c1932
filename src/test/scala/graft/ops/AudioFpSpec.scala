package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Audio fingerprinting: block math, amplitude-scale invariance,
  * planted-duplicate recall through the bucketed pair join, corrupt
  * rows dropping, and the no-all-pairs shape.
  */
class AudioFpSpec extends AnyFunSuite with Matchers with SparkSuiteBase {
  import spark.implicits._

  // deterministic WHITE-noise mono clip (splitmix64 per sample): the
  // near-periodic synthesizeWav ramp aliases across seeds at
  // fingerprint granularity and pairs everything with everything
  private def clip(seed: Long, nFrames: Int, amp: Int = 1): Array[Byte] = {
    val samples = Array.tabulate(nFrames)(i =>
      ((graft.functions.BloomRuntime.splitmix64(
        seed * 1000003L + i) % 1001) * amp).toShort)
    Media.encodeWavPcm16(8000, 1, samples)
  }

  test("block math: F frames at window W yield ((F/W)-1)/8 complete " +
    "blocks, each with a stable 64-bit fingerprint") {
    val blob = clip(5L, 1600) // 100 windows of 16 -> 99 deltas -> 12 blocks
    val fps = Media.audioFingerprintBlocks(blob, windowFrames = 16)
    fps.length shouldBe 12
    fps.map(_._1) shouldBe (0 until 12)
    // deterministic: same bytes, same fingerprints
    Media.audioFingerprintBlocks(blob, 16) shouldBe fps
    // a different clip fingerprints differently
    Media.audioFingerprintBlocks(clip(6L, 1600), 16)
      .map(_._2) should not equal fps.map(_._2)
  }

  test("amplitude scaling leaves every fingerprint bit unchanged " +
    "(energy-delta signs are ratio-invariant)") {
    val a = Media.audioFingerprintBlocks(clip(9L, 1600), 16)
    val b = Media.audioFingerprintBlocks(clip(9L, 1600, amp = 7), 16)
    b shouldBe a
  }

  test("planted duplicates pair with the full shared-block count; " +
    "unrelated clips never pair; corrupt rows drop silently") {
    val originals = (0L until 30L).map(i => (i, clip(i, 1600)))
    val dupes = (0L until 10L).map(i => (i + 1000L, clip(i, 1600, amp = 3)))
    val corrupt = Seq((9999L, "not audio".getBytes))
    val df = (originals ++ dupes ++ corrupt).toDF("id", "blob")
    val got = Media.audioNearDups(df, "id", "blob", windowFrames = 16,
        minSharedBlocks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.map(p => (p._1, p._2)).toSet shouldBe
      (0L until 10L).map(i => (i, i + 1000L)).toSet
    got.foreach(_._3 shouldBe 12L) // all 12 blocks match
  }

  test("pair join buckets on (block, fp): no cartesian, oversized " +
    "buckets drop") {
    val df = (0L until 20L).map(i => (i, clip(i, 800))).toDF("id", "blob")
    val (res, release) = Media.audioNearDupsReleasable(df, "id", "blob",
      windowFrames = 16, minSharedBlocks = 1)
    try {
      res.collect()
      val plan = res.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      plan should not include "CartesianProduct"
      plan should not include "BroadcastNestedLoopJoin"
    } finally release()
    // 20 identical clips -> every (block, fp) bucket holds all 20 ids;
    // a cap below 20 drops them all
    val same = (0L until 20L).map(i => (i, clip(42L, 800)))
      .toDF("id", "blob")
    Media.audioNearDups(same, "id", "blob", windowFrames = 16,
      minSharedBlocks = 1, maxBucketSize = 10).count() shouldBe 0L
  }
}
