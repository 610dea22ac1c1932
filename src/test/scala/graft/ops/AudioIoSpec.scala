package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The JDK `javax.sound.sampled` audio path (AIFF/AU — zero external
  * dependencies) and the conformance pin it gives the hand-rolled WAV
  * walker:
  *
  *  - PARITY: for every synthesized WAV fixture, AudioSystem's
  *    independent RIFF parser must agree with [[Media.parseWav]] on
  *    meta AND with the PCM16 payload sample-for-sample — the
  *    hand-rolled walker verified against a second implementation.
  *  - PCM16 is lossless across containers: AIFF/AU round-trip the
  *    samples bit-exactly, so the WAV analytic oracles carry over
  *    (q254 pins this against DuckDB).
  *  - the sniffer routes WAV/AIFF/AU per row inside one
  *    partition-local pass.
  */
class AudioIoSpec extends AnyFunSuite with Matchers with graft.SparkSuiteBase {

  private def samplesOf(id: Long): Array[Short] = {
    val n = (800 + id % 100).toInt
    Array.tabulate(n)(i => (((id * 31 + i.toLong * 17) % 2003) - 1001).toShort)
  }

  test("hand-rolled WAV walker agrees with AudioSystem's independent " +
    "RIFF parser on meta and every PCM16 sample") {
    for (id <- 0L to 20L) {
      val blob = Media.synthesizeWav(id)
      val hand = Media.parseWav(blob)
      val (sysMeta, sysSamples) = Media.decodeAudioIo(blob)
      sysMeta shouldBe hand
      sysSamples shouldBe samplesOf(id)
      // and the hand-rolled sample read agrees too
      Media.decodeAudioSamples(blob)._2 shouldBe sysSamples
      // rms from either path matches the integer-exact walker rms
      Media.rmsPcm16(blob) shouldBe
        math.sqrt(sysSamples.map(s => s.toLong * s).sum.toDouble /
          sysSamples.length) +- 1e-12
    }
    // stereo: interleaved samples survive the second parser too
    val stereo = Media.encodeWavPcm16(44100, 2,
      Array.tabulate(400)(i => (i * 37 - 3000).toShort))
    val (m2, s2) = Media.decodeAudioIo(stereo)
    m2 shouldBe Media.parseWav(stereo)
    m2.channels shouldBe 2
    m2.nFrames shouldBe 200L
    s2 shouldBe Array.tabulate(400)(i => (i * 37 - 3000).toShort)
  }

  test("aiff/au: encode -> decode round-trips PCM16 bit-exactly") {
    for (id <- Seq(0L, 7L, 99L)) {
      val s = samplesOf(id)
      val aiff = Media.encodeAiffPcm16(8000, 1, s)
      Media.sniffAudioFormat(aiff) shouldBe "aiff"
      val (am, as) = Media.decodeAudioSamples(aiff)
      am.channels shouldBe 1
      am.sampleRate shouldBe 8000
      am.nFrames shouldBe s.length.toLong
      as shouldBe s

      val au = Media.encodeAuPcm16(8000, 1, s)
      Media.sniffAudioFormat(au) shouldBe "au"
      Media.decodeAudioSamples(au)._2 shouldBe s
    }
    Media.sniffAudioFormat(Array[Byte](9, 9, 9, 9)) shouldBe "unknown"
    an[IllegalArgumentException] should be thrownBy
      Media.decodeAudioSamples(Array[Byte](9, 9, 9, 9))
  }

  test("audioQualityStats: hand-computed clipped / silent / clean " +
    "clips, AIFF container included (sniffing path)") {
    import spark.implicits._
    // clipped: alternating full-scale square wave
    val clipped = Array.tabulate[Short](100)(i =>
      if (i % 2 == 0) 32767 else -32768)
    // silent: all zeros
    val silent = Array.fill[Short](100)(0)
    // clean: +-1000 square wave at period 4
    val clean = Array.tabulate[Short](100)(i =>
      if (i % 4 < 2) 1000 else -1000)
    val df = Seq(
      (1L, Media.encodeWavPcm16(8000, 1, clipped)),
      (2L, Media.encodeWavPcm16(8000, 1, silent)),
      (3L, Media.encodeAiffPcm16(8000, 1, clean)))
      .toDF("id", "blob")
    val got = Media.audioQualityStats(df, "id", "blob")
      .collect().map(r => r.getLong(0) -> r).toMap

    val c = got(1L)
    c.getInt(5) shouldBe 32768 // peak |−32768|
    c.getDouble(6) shouldBe 1.0 // clip_frac
    c.getDouble(7) shouldBe 0.0
    c.getLong(8) shouldBe 99L // crosses every step
    c.getBoolean(9) shouldBe true // clipped
    c.getBoolean(10) shouldBe false

    val q = got(2L)
    q.getDouble(4) shouldBe 0.0 // rms
    q.getDouble(7) shouldBe 1.0 // silence_frac
    q.getLong(8) shouldBe 0L
    q.getBoolean(9) shouldBe false
    q.getBoolean(10) shouldBe true // near_silent

    val k = got(3L)
    k.getInt(1) shouldBe 1
    k.getLong(3) shouldBe 100L
    k.getDouble(4) shouldBe (1000.0 +- 1e-9)
    k.getDouble(6) shouldBe 0.0
    k.getLong(8) shouldBe 49L // sign flips at i=2,4,...,98 every 2 steps
    k.getBoolean(9) shouldBe false
    k.getBoolean(10) shouldBe false
  }

  test("videoFrameDiversity: planted static video flagged, varied " +
    "clip scores full diversity, corrupt container drops whole") {
    import spark.implicits._
    val static = Media.encodeGvid(4000,
      Vector.fill(4)(Media.synthesizePpm(7L)))
    val varied = Media.encodeGvid(4000,
      (0 until 4).map(f => Media.synthesizePpm(100L + f)))
    val corrupt = Array[Byte](1, 2, 3, 4, 5)
    val df = Seq((1L, static), (2L, varied), (3L, corrupt))
      .toDF("id", "blob")
    val got = Media.videoFrameDiversity(df, "id", "blob")
      .collect().map(r => r.getLong(0) -> r).toMap
    got.keySet shouldBe Set(1L, 2L) // corrupt dropped whole
    got(1L).getLong(1) shouldBe 4L
    got(1L).getLong(2) shouldBe 1L
    got(1L).getBoolean(4) shouldBe true
    got(2L).getLong(2) shouldBe 4L
    got(2L).getDouble(3) shouldBe 1.0
    got(2L).getBoolean(4) shouldBe false
  }

  test("audioStats decodes a MIXED wav+aiff+au column in one pass " +
    "with identical stats (lossless PCM16 across containers)") {
    import spark.implicits._
    val rows = (0L to 11L).map { id =>
      val s = samplesOf(id)
      val blob = (id % 3) match {
        case 0 => Media.synthesizeWav(id)
        case 1 => Media.encodeAiffPcm16(8000, 1, s)
        case _ => Media.encodeAuPcm16(8000, 1, s)
      }
      (id, blob)
    }
    val got = Media.audioStats(rows.toDF("id", "blob"), "id", "blob")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(5))).toMap
    got.size shouldBe 12
    for (id <- 0L to 11L) {
      val s = samplesOf(id)
      val (ch, rate, frames, rms) = got(id)
      ch shouldBe 1
      rate shouldBe 8000
      frames shouldBe s.length.toLong
      rms shouldBe math.sqrt(
        s.map(x => x.toLong * x).sum.toDouble / s.length) +- 1e-9
    }
  }
}
