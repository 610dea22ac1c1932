package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Byte-level pins for the real PPM/WAV codecs: encode -> decode round
  * trips, header-parse exactness, resize resampling, RMS arithmetic.
  */
class MediaSpec extends AnyFunSuite with Matchers with graft.SparkSuiteBase {

  test("ppm: encode -> decode round trip") {
    val px = Array.tabulate(2 * 3 * 3)(i => (i * 11 % 256).toByte)
    val img = Media.PpmImage(2, 3, px)
    val back = Media.decodePpm(Media.encodePpm(img))
    back.width shouldBe 2
    back.height shouldBe 3
    back.pixels shouldBe px
  }

  test("ppm: decoder tolerates comments and extra whitespace") {
    val px = Array[Byte](1, 2, 3)
    val header = "P6\n# a comment line\n 1  1 \n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val blob = header ++ px
    val img = Media.decodePpm(blob)
    img.width shouldBe 1
    img.height shouldBe 1
    img.pixels shouldBe px
  }

  test("ppm: nearest-neighbor resize picks the mapped source pixels") {
    // 2x1 image: left pixel (10,20,30), right pixel (40,50,60)
    val img = Media.PpmImage(2, 1, Array[Byte](10, 20, 30, 40, 50, 60))
    val up = Media.resizeNearest(img, 4, 1)
    // x=0,1 -> source 0; x=2,3 -> source 1
    up.pixels shouldBe Array[Byte](10, 20, 30, 10, 20, 30, 40, 50, 60, 40, 50, 60)
    val down = Media.resizeNearest(img, 1, 1)
    down.pixels shouldBe Array[Byte](10, 20, 30)
  }

  test("ppm: DataFrame resize re-encodes decodable blobs with exact " +
    "stats") {
    import spark.implicits._
    val blobs = Seq(1L, 2L, 3L)
      .map(id => (id, Media.synthesizePpm(id))).toDF("id", "blob")
    val out = Media.resizePpmImages(blobs, "id", "blob", 8, 4).collect()
    out.length shouldBe 3
    out.foreach { r =>
      r.getAs[Int]("width") shouldBe 8
      r.getAs[Int]("height") shouldBe 4
      r.getAs[Long]("n_bytes") shouldBe 107L // "P6\n8 4\n255\n" + 96 px
      // the re-encoded blob round-trips and matches the reported stats
      val img = Media.decodePpm(r.getAs[Array[Byte]]("blob"))
      img.width shouldBe 8
      img.height shouldBe 4
      val (mr, _, _) = Media.meanRgb(img)
      mr shouldBe r.getAs[Double]("mean_r")
      // resized pixels equal the analytic source formula at the mapped
      // coords (sx = x*w/8, sy = y*h/4)
      val id = r.getAs[Long]("id")
      val w = (4 + id % 8).toInt; val h = (3 + id % 5).toInt
      for (y <- 0 until 4; x <- 0 until 8) {
        val sx = x * w / 8; val sy = y * h / 4
        (img.pixels((y * 8 + x) * 3) & 0xff) shouldBe
          ((id + 7L * sx + 13L * sy) % 256).toInt
      }
    }
  }

  test("ppm: mean treats pixel bytes as unsigned") {
    val img = Media.PpmImage(1, 1, Array[Byte](-1, 0, 127)) // 255, 0, 127
    val (r, g, b) = Media.meanRgb(img)
    r shouldBe 255.0
    g shouldBe 0.0
    b shouldBe 127.0
  }

  test("image hash: brightness invariance, gradient bits, exact-copy " +
    "identity") {
    // deterministic 18x16 image (each 9x8 resize cell samples a
    // DISTINCT source pixel: sx = 2x, sy = 2y)
    def mkImg(f: (Int, Int) => Int): Media.PpmImage = {
      val px = new Array[Byte](18 * 16 * 3)
      for (y <- 0 until 16; x <- 0 until 18; c <- 0 until 3)
        px((y * 18 + x) * 3 + c) = ((f(x, y) + 20 * c) % 200).toByte
      Media.PpmImage(18, 16, px)
    }
    val base = mkImg((x, y) => 3 * x + 5 * y)
    // uniform brightness shift (no byte wrap): both hashes invariant
    val brighter = Media.PpmImage(18, 16,
      base.pixels.map(b => ((b & 0xff) + 40).toByte))
    assert(Media.aHash64(brighter) === Media.aHash64(base))
    assert(Media.dHash64(brighter) === Media.dHash64(base))
    // left-to-right monotone gray: every in-row comparison with a
    // strictly increasing sampled column sets its dHash bit; an 8x8
    // source resized to 9x8 duplicates column 0 (sx = x*8//9), so
    // bit x=0 of each row is 0 and bits 1..7 are 1 -> rows of 0xFE
    val grad = {
      val px = new Array[Byte](8 * 8 * 3)
      for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
        px((y * 8 + x) * 3 + c) = (x * 20).toByte
      Media.PpmImage(8, 8, px)
    }
    assert(Media.dHash64(grad) === java.lang.Long.parseUnsignedLong(
      "fefefefefefefefe", 16))
  }

  test("phash: contrast scale is identity, brightness shift flips at " +
    "most the DC bit, copies collide, distinct images differ") {
    def mkImg(f: (Int, Int) => Int): Media.PpmImage = {
      val px = new Array[Byte](40 * 36 * 3)
      for (y <- 0 until 36; x <- 0 until 40; c <- 0 until 3)
        px((y * 40 + x) * 3 + c) = f(x, y).toByte
      Media.PpmImage(40, 36, px)
    }
    val base = mkImg((x, y) => (x * 2 + y + (x * y) % 7) % 100)
    // exact copy -> identical hash (drives the q214 oracle)
    assert(Media.pHash64(base) === Media.pHash64(
      Media.PpmImage(base.width, base.height, base.pixels.clone())))
    // pure contrast scale (x2, values < 100 so no byte wrap): every
    // DCT coefficient AND the median double -> identical hash
    val contrast = Media.PpmImage(40, 36,
      base.pixels.map(b => ((b & 0xff) * 2).toByte))
    assert(Media.pHash64(contrast) === Media.pHash64(base))
    // uniform brightness shift: only the DC coefficient moves (the
    // AC transform of a constant is 0), so Hamming <= 1
    val brighter = Media.PpmImage(40, 36,
      base.pixels.map(b => ((b & 0xff) + 50).toByte))
    assert(java.lang.Long.bitCount(
      Media.pHash64(brighter) ^ Media.pHash64(base)) <= 1)
    // a structurally different image lands far away
    val other = mkImg((x, y) => (97 * x * x + 31 * y + 13) % 100)
    assert(java.lang.Long.bitCount(
      Media.pHash64(other) ^ Media.pHash64(base)) > 8)
  }

  test("videoNearDups: shared-frame counting, per-video distinct " +
    "rule, corrupt containers drop whole") {
    import spark.implicits._
    // three distinct frames A,B,C (visually different synth images)
    val fa = Media.synthesizePpm(1L)
    val fb = Media.synthesizePpm(2L)
    val fc = Media.synthesizePpm(3L)
    val v1 = Media.encodeGvid(4000, Seq(fa, fb, fc))     // A B C
    val v2 = Media.encodeGvid(4000, Seq(fa, fb))         // A B -> 2 shared
    val v3 = Media.encodeGvid(4000, Seq(fc, fc, fc, fc)) // still video C
    val v4 = Media.encodeGvid(4000, Seq(fb))             // B only
    val corrupt = "not a video".getBytes
    val df = Seq((1L, v1), (2L, v2), (3L, v3), (4L, v4),
      (9L, corrupt)).toDF("id", "blob")
    val pairs = Media.videoNearDups(df, "id", "blob",
      minSharedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    pairs shouldBe Map((1L, 2L) -> 2L) // only v1-v2 share >= 2 frames
    // at minSharedFrames=1 the still video pairs with v1 ONCE (its
    // repeated frame is distinct-ed per video), v4 joins via B, and
    // the corrupt blob contributes nothing
    val one = Media.videoNearDups(df, "id", "blob",
      minSharedFrames = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    one shouldBe Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (1L, 4L) -> 1L,
      (2L, 4L) -> 1L)
  }

  test("phash: banded join recovers planted exact copies at Hamming 0") {
    import spark.implicits._
    val blobs = (0L until 30L).map(i =>
      (i, Media.synthesizePpm(i))) ++ (0L until 30L).map(i =>
      (i + 1000L, Media.synthesizePpm(i)))
    val df = blobs.toDF("doc_id", "blob")
    val pairs = Media.pHashNearDups(df, "doc_id", "blob", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = pairs.filter { case (a, b, _) => b == a + 1000L }
    planted.length shouldBe 30
    all(planted.map(_._3)) shouldBe 0
  }

  test("image hash: banded Hamming join recovers planted near-identical " +
    "and exact copies") {
    import spark.implicits._
    def mkBlob(f: (Int, Int) => Int): Array[Byte] = {
      val px = new Array[Byte](18 * 16 * 3)
      for (y <- 0 until 16; x <- 0 until 18; c <- 0 until 3)
        px((y * 18 + x) * 3 + c) = ((f(x, y) + 20 * c) % 200).toByte
      Media.encodePpm(Media.PpmImage(18, 16, px))
    }
    val baseF = (x: Int, y: Int) => 7 * x + 11 * y
    val base = mkBlob(baseF)
    // invert ONE sampled source pixel (cell x=2,y=3 samples (4,6)):
    // at most the two adjacent in-row dHash comparisons flip
    val near = mkBlob((x, y) =>
      if (x == 4 && y == 6) 180 - baseF(x, y) else baseF(x, y))
    val corpus = (0L until 50L).map(id =>
      (id, Media.synthesizePpm(id))) ++
      Seq((500L, base), (501L, near), (502L, base.clone()))
    val df = corpus.toDF("id", "blob")
    val (pairs, release) =
      Media.imageHashNearDupsReleasable(df, "id", "blob", maxHamming = 3)
    val got = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    release()
    assert(got.contains((500L, 502L)) && got((500L, 502L)) === 0,
      s"exact copy must pair at hamming 0, got $got")
    assert(got.contains((500L, 501L)) && got((500L, 501L)) <= 2,
      s"planted near-identical pair missing or too far: $got")
    assert(got.contains((501L, 502L)))
    // hashes themselves: 16 bytes of state per image
    val hashes = Media.imageHashes(df, "id", "blob")
    assert(hashes.columns.toSeq === Seq("id", "ahash", "dhash"))
    assert(hashes.count() === 53L)
  }

  test("wav: encode -> parse round trip with exact header fields") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768)
    val blob = Media.encodeWavPcm16(44100, 1, samples)
    val m = Media.parseWav(blob)
    m.channels shouldBe 1
    m.sampleRate shouldBe 44100
    m.bitsPerSample shouldBe 16
    m.nFrames shouldBe 5L
  }

  test("wav: windowed rms covers all frames with exact per-window energy") {
    // 5 frames of amplitude 100 then 5 of amplitude 300, window 4:
    // w0 = 4x100^2, w1 = 100^2 + 3x300^2, w2 = 2x300^2 (partial)
    val samples = (Array.fill(5)(100) ++ Array.fill(5)(300)).map(_.toShort)
    val blob = Media.encodeWavPcm16(8000, 1, samples)
    val got = Media.windowRmsPcm16(blob, 4)
    got.map(t => (t._1, t._2)) shouldBe Seq((0, 4), (1, 4), (2, 2))
    got(0)._3 shouldBe 100.0
    got(1)._3 shouldBe math.sqrt((100.0 * 100 + 3 * 300.0 * 300) / 4)
    got(2)._3 shouldBe 300.0
    // stereo: windows count FRAMES, energy sums both channels
    val st = Media.encodeWavPcm16(8000, 2,
      Array[Short](100, 200, 100, 200, 100, 200, 100, 200))
    val sw = Media.windowRmsPcm16(st, 2)
    sw.length shouldBe 2
    sw.foreach(_._3 shouldBe math.sqrt((100.0 * 100 + 200.0 * 200) / 2))
    // DataFrame surface: one row per (file, window)
    import spark.implicits._
    val df = Seq((1L, blob)).toDF("id", "blob")
    Media.wavWindowRms(df, "id", "blob", 4).count() shouldBe 3L
  }

  test("wav: windowed zcr counts in-window sign flips; peak is max |s|") {
    // samples: +100 -100 +100 +100 -200 | -300 0 -300 +400 -400, window 5
    // w0 flips: +/-, -/+, (same), +/- -> 3; peak 200
    // w1 flips: 0 counts as >= 0: -300->0 flip, 0->-300 flip,
    //   -300->+400 flip, +400->-400 flip -> 4; peak 400
    val samples = Array[Short](100, -100, 100, 100, -200,
      -300, 0, -300, 400, -400)
    val blob = Media.encodeWavPcm16(8000, 1, samples)
    val got = Media.windowStatsPcm16(blob, 5)
    got.map(t => (t._1, t._2, t._4, t._5)) shouldBe
      Seq((0, 5, 3L, 200), (1, 5, 4L, 400))
    // rms agrees with the rms-only path
    val rmsOnly = Media.windowRmsPcm16(blob, 5)
    got.map(_._3) shouldBe rmsOnly.map(_._3)
    // one big window sees the same 7 flips (the w0/w1 boundary
    // transition -200 -> -300 is itself a non-flip, so splitting at it
    // loses nothing here; splitting elsewhere would)
    val one = Media.windowStatsPcm16(blob, 10)
    one.head._4 shouldBe 7L
    // splitting INSIDE flips loses exactly those: windows of 2 cut the
    // chain at 4 flip transitions, keeping only 3 of the 7
    Media.windowStatsPcm16(blob, 2).map(_._4).sum shouldBe 3L
    // stereo: per-channel chains, summed; peak over both channels
    // ch0: +100 -100 +100 -> 2 flips; ch1: -50 -50 +900 -> 1 flip
    val st = Media.encodeWavPcm16(8000, 2,
      Array[Short](100, -50, -100, -50, 100, 900))
    val sw = Media.windowStatsPcm16(st, 3)
    sw.map(t => (t._4, t._5)) shouldBe Seq((3L, 900))
    // DataFrame surface: one row per (file, window), schema pinned
    import spark.implicits._
    val df = Seq((7L, blob)).toDF("id", "blob")
    val out = Media.wavWindowStats(df, "id", "blob", 5)
    out.columns.toSeq shouldBe
      Seq("id", "window_idx", "n_frames", "rms", "zcr", "peak")
    out.count() shouldBe 2L
  }

  test("wav: rms of a known square wave") {
    // constant amplitude A -> rms == A
    val blob = Media.encodeWavPcm16(8000, 1, Array.fill[Short](100)(500))
    Media.rmsPcm16(blob) shouldBe 500.0 +- 1e-9
  }

  test("wav: stereo frame count divides by channels") {
    val blob = Media.encodeWavPcm16(16000, 2, new Array[Short](8))
    Media.parseWav(blob).nFrames shouldBe 4L
  }

  test("corrupt blobs error fast instead of looping or misdecoding") {
    // WAV with a negative chunk size used to spin the chunk walk forever
    val bad = Media.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3))
    val buf = java.nio.ByteBuffer.wrap(bad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(16, -8) // fmt chunk size -> -8
    an[IllegalArgumentException] should be thrownBy Media.parseWav(bad)

    // chunk extending past the blob
    val short = Media.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3))
    java.nio.ByteBuffer.wrap(short)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(40, 1 << 20)
    an[IllegalArgumentException] should be thrownBy Media.parseWav(short)

    // PPM dims whose pixel count overflows Int must fail the truncation
    // guard, not pass it with a negative size
    val huge = "P6\n46341 46341\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ Array[Byte](0)
    an[IllegalArgumentException] should be thrownBy Media.decodePpm(huge)

    // non-digit bytes in a header token are an error, not a garbage dim
    val alpha = "P6\n1x2 1\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      new Array[Byte](9)
    an[IllegalArgumentException] should be thrownBy Media.decodePpm(alpha)
  }

  test("synthesized blobs decode to their analytic definitions") {
    val img = Media.decodePpm(Media.synthesizePpm(17L))
    img.width shouldBe (4 + 17 % 8)
    img.height shouldBe (3 + 17 % 5)
    // pixel (x=2, y=1) red channel: (17 + 7*2 + 13*1) % 256
    val idx = (1 * img.width + 2) * 3
    (img.pixels(idx) & 0xff) shouldBe ((17 + 14 + 13) % 256)

    val m = Media.parseWav(Media.synthesizeWav(17L))
    m.nFrames shouldBe (800 + 17 % 100).toLong
    m.sampleRate shouldBe 8000
  }
}
