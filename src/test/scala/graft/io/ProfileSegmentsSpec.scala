package graft.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.metrics.{ColumnProfileState, ProfileConfig}

/** Chunked MessageSegment wire form: a wide profile splits into bounded
  * segments (metadata + <=1MB column chunks) and reassembles to the same
  * statistics — the reference's ColumnsChunkSegmentIterator contract
  * (ColumnsChunkSegmentIterator.java:11-75, DatasetProfile.java:190-215).
  */
class ProfileSegmentsSpec extends AnyFunSuite with Matchers {

  private def column(seed: Int): ColumnProfileState = {
    val st = new ColumnProfileState(ProfileConfig.default)
    (1 to 50).foreach(i => st.trackLong((seed * 1000 + i).toLong))
    st.trackString(s"col-$seed-value")
    st.trackNull()
    st
  }

  private def wideProfile(nCols: Int): ProfileProto.DatasetProfile =
    ProfileProto.DatasetProfile(
      "wide-session", 1700000000000L, Some(1699999999999L),
      Map("env" -> "test"), Map("who" -> "segments-spec"),
      (0 until nCols).map(i => f"c$i%04d" -> column(i)).toMap)

  private def assertSameStats(
      a: ProfileProto.DatasetProfile, b: ProfileProto.DatasetProfile): Unit = {
    b.sessionId shouldBe a.sessionId
    b.sessionTimestamp shouldBe a.sessionTimestamp
    b.dataTimestamp shouldBe a.dataTimestamp
    b.tags shouldBe a.tags
    b.metadata shouldBe a.metadata
    b.columns.keySet shouldBe a.columns.keySet
    a.columns.foreach { case (name, orig) =>
      val c = b.columns(name)
      c.count shouldBe orig.count
      c.nullCount shouldBe orig.nullCount
      c.numbers.count shouldBe orig.numbers.count
      c.numbers.finalMin shouldBe orig.numbers.finalMin
      c.numbers.finalMax shouldBe orig.numbers.finalMax
      c.numbers.finalSum shouldBe orig.numbers.finalSum
      c.numbers.kll.getN shouldBe orig.numbers.kll.getN
      c.strings.count shouldBe orig.strings.count
      c.hll.getEstimate shouldBe orig.hll.getEstimate
    }
  }

  test("wide profile (350 columns) round trips; every segment stays bounded") {
    val p = wideProfile(350)
    val segs = ProfileSegments.segments(p, "m-350")
    segs.length should be >= 2 // metadata + at least one column chunk
    // serialized segments respect the 1MB cap plus framing slack (the cap
    // bounds ColumnMessage content; marker + tags are the small remainder)
    segs.foreach(_.length should be <= ProfileSegments.MaxChunkContentBytes + 256)

    val bos = new ByteArrayOutputStream()
    ProfileSegments.writeDelimited(bos, p, "m-350")
    val back = ProfileSegments.readDelimited(
      new ByteArrayInputStream(bos.toByteArray))
    back.length shouldBe 1
    assertSameStats(p, back.head)
  }

  test("small cap forces many chunks, greedy cut keeps content under cap") {
    val p = wideProfile(40)
    val cap = 4096
    val colMsgLens = p.columns.toSeq.sortBy(_._1)
      .map { case (n, st) => ProfileProto.columnBytes(n, st).length }
    val segs = ProfileSegments.segments(p, "m-cap", maxChunkContentBytes = cap)
    // metadata + ceil-ish packing: strictly more than one column chunk
    segs.length should be > 2
    // every column message is far under the cap here, so every chunk's
    // serialized size must stay under cap + framing
    segs.tail.foreach(_.length should be <= cap + 64)
    // nothing lost: total columns across chunks equals the profile width
    val back = ProfileSegments.readDelimited(new ByteArrayInputStream({
      val bos = new ByteArrayOutputStream()
      ProfileSegments.writeDelimited(bos, p, "m-cap", cap)
      bos.toByteArray
    }))
    back.head.columns.size shouldBe 40
    assertSameStats(p, back.head)
    // sanity: the fixture really exercises packing (>1 col per chunk)
    colMsgLens.max should be < cap
  }

  test("a single column larger than the cap still ships (oversized chunk)") {
    val p = ProfileProto.DatasetProfile("s", 1L, None, Map.empty, Map.empty,
      Map("big" -> column(1)))
    val tiny = 10 // smaller than any real ColumnMessage
    val segs = ProfileSegments.segments(p, "m", maxChunkContentBytes = tiny)
    segs.length shouldBe 2 // metadata + one oversized chunk
    val back = ProfileSegments.readDelimited(new ByteArrayInputStream({
      val bos = new ByteArrayOutputStream()
      ProfileSegments.writeDelimited(bos, p, "m", tiny)
      bos.toByteArray
    }))
    assertSameStats(p, back.head)
  }

  test("two profiles interleaved on one stream reassemble by marker") {
    val p1 = wideProfile(6).copy(sessionId = "one")
    val p2 = wideProfile(3).copy(sessionId = "two")
    val s1 = ProfileSegments.segments(p1, "m-one", maxChunkContentBytes = 2048)
    val s2 = ProfileSegments.segments(p2, "m-two", maxChunkContentBytes = 2048)
    // interleave: meta1, meta2, then alternating chunks
    val mixed = Seq(s1.head, s2.head) ++
      s1.tail.zipAll(s2.tail, Array.empty[Byte], Array.empty[Byte])
        .flatMap { case (x, y) => Seq(x, y) }.filter(_.nonEmpty)
    val bos = new ByteArrayOutputStream()
    mixed.foreach { seg =>
      val w = new Wire.Writer
      w.varint(seg.length.toLong)
      bos.write(w.toByteArray)
      bos.write(seg)
    }
    val back = ProfileSegments.readDelimited(
      new ByteArrayInputStream(bos.toByteArray))
    back.map(_.sessionId) shouldBe Seq("one", "two")
    assertSameStats(p1, back.find(_.sessionId == "one").get)
    assertSameStats(p2, back.find(_.sessionId == "two").get)
  }
}
