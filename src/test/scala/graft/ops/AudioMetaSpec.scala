package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Header-only audio metadata ([[Media.parseAudioMeta]]): container/
  * channels/rate/depth/frames/duration from header bytes alone,
  * conformance-pinned against the full decoder per container; the
  * header-only claim is proven on AIFF/AU by parsing blobs truncated
  * inside their sample data (WAV's hand-rolled walker keeps its
  * VALIDATED fail-fast semantics — it requires the promised payload
  * length to be present — but still never reads a sample).
  */
class AudioMetaSpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  private def samples(n: Int): Array[Short] =
    Array.tabulate(n)(i => ((i * 37) % 2003 - 1001).toShort)

  test("meta agrees with the full decoder on WAV, AIFF and AU") {
    val s = samples(600)
    val blobs = Seq(
      "wav" -> Media.encodeWavPcm16(8000, 2, s),
      "aiff" -> Media.encodeAiffPcm16(8000, 2, s),
      "au" -> Media.encodeAuPcm16(8000, 2, s))
    for ((fmt, blob) <- blobs) {
      val (gotFmt, m) = Media.parseAudioMeta(blob)
      val (dm, ds) = Media.decodeAudioSamples(blob)
      gotFmt shouldBe fmt
      m.channels shouldBe dm.channels
      m.sampleRate shouldBe dm.sampleRate
      m.bitsPerSample shouldBe 16
      m.nFrames shouldBe dm.nFrames
      ds.length shouldBe (m.nFrames * m.channels).toInt
    }
  }

  test("AIFF/AU metadata is header-only: blobs truncated inside the " +
    "sample data still parse, while the decoder fails on the same bytes") {
    for (mk <- Seq(Media.encodeAiffPcm16 _, Media.encodeAuPcm16 _)) {
      val blob = mk(8000, 1, samples(500))
      val head = java.util.Arrays.copyOf(blob, 80)
      val (_, m) = Media.parseAudioMeta(head)
      m.nFrames shouldBe 500L
      intercept[Exception](Media.decodeAudioSamples(head))
    }
    // WAV: the validated walker refuses a truncated payload outright
    val wav = Media.encodeWavPcm16(8000, 1, samples(500))
    intercept[IllegalArgumentException](
      Media.parseAudioMeta(java.util.Arrays.copyOf(wav, 60)))
  }

  test("the frame op matches the scalar parser; corrupt headers drop " +
    "row-wise in the lenient form and fail the strict form") {
    import spark.implicits._
    val rows = (0L to 8L).map { id =>
      val s = samples(200 + id.toInt * 10)
      val blob = (id % 3) match {
        case 0 => Media.encodeWavPcm16(8000, 1, s)
        case 1 => Media.encodeAiffPcm16(8000, 1, s)
        case _ => Media.encodeAuPcm16(8000, 1, s)
      }
      (id, blob)
    }
    val got = Media.audioMeta(rows.toDF("id", "blob"), "id", "blob")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getLong(5),
          r.getLong(6)))).toMap
    for ((id, blob) <- rows) {
      val (fmt, m) = Media.parseAudioMeta(blob)
      got(id) shouldBe ((fmt, m.channels, m.sampleRate, m.nFrames,
        m.nFrames * 1000000L / m.sampleRate))
    }
    val mixed = (rows :+ ((99L, Array[Byte](9, 9, 9, 9, 9))))
      .toDF("id", "blob")
    intercept[org.apache.spark.SparkException] {
      Media.audioMeta(mixed, "id", "blob").collect()
    }
    Media.audioMetaLenient(mixed, "id", "blob")
      .collect().map(_.getLong(0)).toSet shouldBe rows.map(_._1).toSet
  }
}
