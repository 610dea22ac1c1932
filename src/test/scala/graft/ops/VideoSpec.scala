package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** GVID video container: round trip, header-only stats, frame
  * sampling, and composability of sampled frames with the image ops.
  */
class VideoSpec extends AnyFunSuite with Matchers with SparkSuiteBase {
  import spark.implicits._

  test("encode -> parse round trip preserves fps, count, and every " +
      "frame byte-exactly") {
    val frames = (0 until 4).map(f => Media.synthesizePpm(100L + f))
    val blob = Media.encodeGvid(2500, frames)
    val meta = Media.parseGvidMeta(blob)
    meta.fpsMilli shouldBe 2500
    meta.nFrames shouldBe 4
    val back = Media.gvidFrames(blob).toSeq
    back.map(_._1) shouldBe Seq(0, 1, 2, 3)
    back.zip(frames).foreach { case ((_, b), f) =>
      b.toSeq shouldBe f.toSeq
    }
  }

  test("videoStats walks headers only; duration is exact integer math") {
    val df = Seq(
      (1L, Media.synthesizeGvid(1L, 5, fpsMilli = 4000)),
      (2L, Media.synthesizeGvid(2L, 8, fpsMilli = 1000)))
      .toDF("id", "blob")
    val got = Media.videoStats(df, "id", "blob")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    got(1L) shouldBe ((5, 4000, 1250000L))   // 5 frames @ 4 fps
    got(2L) shouldBe ((8, 1000, 8000000L))   // 8 frames @ 1 fps
  }

  test("frame sampling keeps every Nth frame with correct dims and " +
      "means; sampled frames feed the image pipeline directly") {
    val df = Seq((7L, Media.synthesizeGvid(7L, 6))).toDF("id", "blob")
    val frames = Media.videoFrameSample(df, "id", "blob", everyN = 2)
    val got = frames.collect()
    got.map(_.getInt(1)).sorted.toSeq shouldBe Seq(0, 2, 4)
    got.foreach { r =>
      val fid = 7L * 31 + r.getInt(1)
      r.getInt(2) shouldBe (4 + fid % 8).toInt
      r.getInt(3) shouldBe (3 + fid % 5).toInt
      val img = Media.decodePpm(r.getAs[Array[Byte]](7))
      val (mr, _, _) = Media.meanRgb(img)
      r.getDouble(4) shouldBe (mr +- 1e-12)
    }
    // composability: hash the sampled frames like any image column
    val hashed = Media.imageHashes(
      frames.select((col("id") * 100 + col("frame_idx")).as("fid"),
        col("frame")), "fid", "frame")
    hashed.count() shouldBe 3
  }

  test("everyN = 1 keeps all frames; bad magic is rejected") {
    val df = Seq((1L, Media.synthesizeGvid(1L, 3))).toDF("id", "blob")
    Media.videoFrameSample(df, "id", "blob", 1).count() shouldBe 3
    intercept[IllegalArgumentException] {
      Media.parseGvidMeta("nope".getBytes ++ Array[Byte](0, 0, 0, 0))
    }
  }

  test("corrupt blobs drop their row, never the job (python ValueError " +
      "policy): bad magic, negative/huge counts, truncation, bad frame " +
      "length") {
    val good = Media.synthesizeGvid(9L, 4)
    def withCount(n: Int): Array[Byte] = {
      val b = good.clone()
      java.nio.ByteBuffer.wrap(b).putInt(8, n); b
    }
    def withFrameLen(len: Int): Array[Byte] = {
      val b = good.clone()
      java.nio.ByteBuffer.wrap(b).putInt(12, len); b
    }
    val corrupt = Seq(
      1L -> "not a video".getBytes,          // bad magic
      2L -> good.take(7),                    // truncated header
      3L -> withCount(-5),                   // negative frame count
      4L -> withCount(Int.MaxValue),         // count promising > blob
      5L -> withFrameLen(-1),                // negative frame length
      6L -> withFrameLen(Int.MaxValue / 2),  // length past the end
      7L -> good.dropRight(10))              // truncated mid-frame
    val df = (corrupt :+ (8L -> good)).toDF("id", "blob")

    // header-only stats: the four header-corrupt rows drop; the two
    // frame-level corruptions parse (headers are fine) — plus the clean row
    val stats = Media.videoStats(df, "id", "blob").collect()
    stats.map(_.getLong(0)).sorted.toSeq shouldBe Seq(5L, 6L, 7L, 8L)

    // frame decode: every corrupt video drops WHOLE; only the clean one
    // survives, with all its sampled frames
    val frames = Media.videoFrameSample(df, "id", "blob", everyN = 1)
      .collect()
    frames.map(_.getLong(0)).distinct.toSeq shouldBe Seq(8L)
    frames.length shouldBe 4
  }
}
