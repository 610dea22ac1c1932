package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Header-only image metadata ([[Media.parseImageMeta]]): dims/format/
  * depth from header bytes alone — conformance-pinned against the full
  * decoder on every container, and proven header-only by parsing blobs
  * whose PIXEL DATA is truncated away (where the decoder rightly
  * fails).
  */
class ImageMetaSpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  test("meta agrees with the full decoder on PPM, PNG and JPEG " +
    "containers (dims always; depth/components per container)") {
    for (id <- 0L to 11L) {
      val ppm = Media.synthesizePpm(id)
      val img = Media.decodePpm(ppm)
      val mPpm = Media.parseImageMeta(ppm)
      (mPpm.format, mPpm.width, mPpm.height, mPpm.bitDepth,
        mPpm.nComponents) shouldBe
        (("ppm", img.width, img.height, 8, 3))
      val png = Media.synthesizePng(id)
      val mPng = Media.parseImageMeta(png)
      (mPng.format, mPng.width, mPng.height) shouldBe
        (("png", img.width, img.height))
      mPng.bitDepth shouldBe 8
      // the JDK writer emits truecolor (3) or truecolor+alpha (4)
      mPng.nComponents should (be(3) or be(4))
      val jpg = Media.synthesizeJpeg(id)
      val mJpg = Media.parseImageMeta(jpg)
      (mJpg.format, mJpg.width, mJpg.height, mJpg.bitDepth,
        mJpg.nComponents) shouldBe (("jpeg", img.width, img.height, 8, 3))
    }
  }

  test("metadata is genuinely header-only: blobs truncated INSIDE the " +
    "pixel data still parse, while the decoder fails on the same bytes") {
    val png = Media.synthesizePng(5L)
    val pngHead = java.util.Arrays.copyOf(png, 40) // signature+IHDR+7
    Media.parseImageMeta(pngHead).width shouldBe
      Media.parseImageMeta(png).width
    intercept[Exception](Media.decodeImage(pngHead))

    val ppm = Media.synthesizePpm(5L)
    val ppmHead = java.util.Arrays.copyOf(ppm, 12) // header only
    Media.parseImageMeta(ppmHead).width shouldBe
      Media.parseImageMeta(ppm).width
    intercept[Exception](Media.decodeImage(ppmHead))

    val jpg = Media.synthesizeJpeg(5L)
    // find the SOS marker and cut right after the SOF region before it
    val sos = (2 until jpg.length - 1).find(i =>
      (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xda).get
    val jpgHead = java.util.Arrays.copyOf(jpg, sos)
    Media.parseImageMeta(jpgHead).width shouldBe
      Media.parseImageMeta(jpg).width
    intercept[Exception](Media.decodeImage(jpgHead))
  }

  test("corrupt headers fail fast (strict) and drop row-wise " +
    "(lenient); the frame op matches the scalar parser") {
    import spark.implicits._
    val rows = (0L to 8L).map { id =>
      val blob = (id % 3) match {
        case 0 => Media.synthesizePpm(id)
        case 1 => Media.synthesizePng(id)
        case _ => Media.synthesizeJpeg(id)
      }
      (id, blob)
    }
    val good = rows.toDF("id", "blob")
    val got = Media.imageMeta(good, "id", "blob")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    for ((id, blob) <- rows) {
      val m = Media.parseImageMeta(blob)
      got(id) shouldBe ((m.format, m.width, m.height))
    }
    // strict: one corrupt row fails the job
    val mixed = (rows :+ ((99L, "PNGgarbage".getBytes("ISO-8859-1"))))
      .toDF("id", "blob")
    intercept[org.apache.spark.SparkException] {
      Media.imageMeta(mixed, "id", "blob").collect()
    }
    // lenient: the corrupt row drops, the rest survive
    val kept = Media.imageMetaLenient(mixed, "id", "blob")
      .collect().map(_.getLong(0)).toSet
    kept shouldBe rows.map(_._1).toSet
  }

  test("malformed containers are rejected with named reasons, not " +
    "mis-parsed: bad PNG color type, SOS before SOF, truncated segment") {
    val png = Media.synthesizePng(1L)
    val badColor = png.clone(); badColor(25) = 9 // invalid color type
    intercept[IllegalArgumentException](Media.parsePngMeta(badColor))
    // a JPEG whose first non-SOI segment is SOS (no frame header)
    val noSof = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xda.toByte, 0, 4, 0, 0)
    intercept[IllegalArgumentException](Media.parseJpegMeta(noSof))
    // a segment length pointing past the end
    val trunc = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe0.toByte, 0x7f, 0x00)
    intercept[IllegalArgumentException](Media.parseJpegMeta(trunc))
  }
}
