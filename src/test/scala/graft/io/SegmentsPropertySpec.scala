package graft.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.metrics.{ColumnProfileState, ProfileConfig}

/** Property-style checks (deterministic seeded sampling, same approach
  * as MergePropertiesSpec) for the chunked MessageSegment codec: ANY
  * profile shape (column count, value counts, chunk cap) must round
  * trip with nothing lost, and chunk packing must respect the cap
  * whenever a single column fits it.
  */
class SegmentsPropertySpec extends AnyFunSuite with Matchers {

  private def column(seed: Int, values: Int): ColumnProfileState = {
    val st = new ColumnProfileState(ProfileConfig.default)
    (1 to values).foreach(i => st.trackLong((seed * 997 + i).toLong))
    if (seed % 3 == 0) st.trackString(s"s$seed")
    if (seed % 5 == 0) st.trackNull()
    st
  }

  private def randomProfile(rnd: scala.util.Random): ProfileProto.DatasetProfile = {
    val nCols = 1 + rnd.nextInt(40)
    val values = 1 + rnd.nextInt(60)
    val tagged = rnd.nextBoolean()
    ProfileProto.DatasetProfile(
      s"p-$nCols-$values", nCols.toLong, if (tagged) Some(7L) else None,
      if (tagged) Map("whylogs.tag.k" -> "v") else Map.empty, Map.empty,
      (0 until nCols).map(i => f"c$i%03d" -> column(i, values)).toMap)
  }

  test("any profile round trips through segments losslessly (40 samples)") {
    val rnd = new scala.util.Random(0xf00dL)
    (1 to 40).foreach { _ =>
      val p = randomProfile(rnd)
      val cap = 512 + rnd.nextInt(64 * 1024)
      val bos = new ByteArrayOutputStream()
      ProfileSegments.writeDelimited(bos, p, s"m-${p.sessionId}", cap)
      val back = ProfileSegments.readDelimited(
        new ByteArrayInputStream(bos.toByteArray))
      back.length shouldBe 1
      val b = back.head
      b.sessionId shouldBe p.sessionId
      b.dataTimestamp shouldBe p.dataTimestamp
      b.tags shouldBe p.tags
      b.columns.keySet shouldBe p.columns.keySet
      p.columns.foreach { case (n, orig) =>
        b.columns(n).count shouldBe orig.count
        b.columns(n).numbers.finalSum shouldBe orig.numbers.finalSum
      }
    }
  }

  test("chunk content respects the cap when every column fits (40 samples)") {
    val rnd = new scala.util.Random(0xbeefL)
    (1 to 40).foreach { _ =>
      val p = randomProfile(rnd)
      val msgLens = p.columns.toSeq.sortBy(_._1)
        .map { case (n, st) => ProfileProto.columnBytes(n, st).length }
      val cap = msgLens.max * 2 // every column fits; packing must honor cap
      val segs = ProfileSegments.segments(p, "m", cap)
      // segment 0 is metadata; the rest carry <= cap of column content
      // (+ marker/framing slack)
      segs.tail.foreach(_.length should be <= cap + 64)
      // and nothing is dropped across the chunks
      val total = segs.tail.map { seg =>
        var n = 0
        Wire.fields(seg).foreach {
          case f @ Wire.Field(3, 2, _) =>
            Wire.fields(f.asBytes).foreach {
              case Wire.Field(2, 2, _) => n += 1
              case _ =>
            }
          case _ =>
        }
        n
      }.sum
      total shouldBe p.columns.size
    }
  }
}
