package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Time-shift-tolerant audio dedup ([[Media.audioNearDupsShifted]]):
  * offset-consistent sliding-fingerprint voting recovers copies the
  * blocked join documents as out of reach (shifts that are not
  * multiples of 8 x windowFrames).
  */
class AudioShiftSpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  private val W = 32

  private def samples(id: Long, n: Int): Array[Short] =
    Array.tabulate(n)(i =>
      (((id * 31 + i.toLong * 17 + (i * i) % 97) % 2003) - 1001).toShort)

  private def wav(s: Array[Short]): Array[Byte] =
    Media.encodeWavPcm16(8000, 1, s)

  test("a copy shifted by 3 windows pairs at a consistent offset " +
    "(shift == -3) through the sliding join; the blocked join misses " +
    "it; unrelated clips never pair") {
    import spark.implicits._
    val base = samples(7L, 50 * W)
    val silence = new Array[Short](3 * W)
    val df = Seq(
      (0L, wav(base)),
      (1L, wav(silence ++ base)), // 3-window shift of clip 0
      (2L, wav(samples(99L, 50 * W))) // unrelated
    ).toDF("id", "blob")

    val shifted = Media.audioNearDupsShifted(df, "id", "blob",
      windowFrames = W, minSharedBlocks = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(shifted.contains((0L, 1L)),
      s"shifted copy not recovered: $shifted")
    val (shift, nShared) = shifted((0L, 1L))
    shift shouldBe -3L // original window s matches copy window s + 3
    nShared should be >= 30L
    shifted.keySet.filter(p => p._1 == 2L || p._2 == 2L) shouldBe empty

    // the blocked (alignment-sensitive) join misses the same pair —
    // the exact gap its scaladoc documents and this op closes
    val blocked = Media.audioNearDups(df, "id", "blob",
      windowFrames = W, minSharedBlocks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    blocked should not contain ((0L, 1L))
  }

  test("an exact (unshifted) copy pairs at shift 0 with nearly all " +
    "sliding fingerprints shared") {
    import spark.implicits._
    val base = samples(11L, 40 * W)
    val df = Seq((0L, wav(base)), (1L, wav(base.clone())))
      .toDF("id", "blob")
    val got = Media.audioNearDupsShifted(df, "id", "blob",
      windowFrames = W, minSharedBlocks = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    got.keySet should contain((0L, 1L))
    val (shift, nShared) = got((0L, 1L))
    shift shouldBe 0L
    // 40 windows -> 39 deltas -> 32 sliding fingerprints, all shared
    nShared shouldBe 32L
  }

  test("sliding fingerprints: count and shift-identity invariants") {
    val s = samples(3L, 20 * W)
    val fps = Media.audioFingerprintsSliding(wav(s), W)
    fps.length shouldBe (20 - 1 - 8 + 1) // deltas - 8 + 1
    fps.map(_._1) shouldBe (0 until fps.length)
    // a 2-window shift reproduces the interior fingerprints at +2
    val shifted = Media.audioFingerprintsSliding(
      wav(new Array[Short](2 * W) ++ s), W)
    val orig = fps.toMap
    val sh = shifted.toMap
    // away from the splice boundary the maps agree at offset 2
    val agree = (3 until fps.length).count(i => sh.get(i + 2).contains(orig(i)))
    agree shouldBe (fps.length - 3)
  }
}
