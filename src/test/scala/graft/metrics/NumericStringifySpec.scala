package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bit-parity contract for the r17 numeric stringify fast path: the
  * profile's HLL and frequent-items sketches must be BYTE-IDENTICAL to
  * the historical `sketch.update(String.valueOf(v))` route for every
  * value shape — the HLL estimate and freq items are oracle-pinned
  * (q11/q12) and wire-format-visible, so "approximately equal" is not
  * a valid outcome here.
  */
class NumericStringifySpec extends AnyFunSuite with Matchers {

  import org.apache.datasketches.hll.HllSketch
  import org.apache.datasketches.frequencies.ItemsSketch
  import org.apache.datasketches.common.ArrayOfStringsSerDe

  private def referenceSketches(
      strings: Seq[String]): (Array[Byte], Array[Byte]) = {
    val hll = new HllSketch(12)
    val freq = new ItemsSketch[String](128)
    strings.foreach { s => hll.update(s); freq.update(s) }
    (hll.toCompactByteArray, freq.toByteArray(new ArrayOfStringsSerDe))
  }

  private def stateSketches(
      track: ColumnProfileState => Unit): (Array[Byte], Array[Byte]) = {
    val st = new ColumnProfileState(ProfileConfig())
    track(st)
    (st.hll.toCompactByteArray,
      st.freq.toByteArray(new ArrayOfStringsSerDe))
  }

  private val longs: Seq[Long] = Seq(0L, 1L, -1L, 7L, -7L, 10L, -10L,
    99L, 100L, 12345L, -54321L, 9999999L, 10000000L, 123456789012L,
    -123456789012L, Int.MaxValue.toLong, Int.MinValue.toLong,
    Long.MaxValue, Long.MinValue) ++ (0L until 2000L) ++
    (0L until 50L).map(i => i * 7919L - 100000L)

  test("trackLong hashes exactly the Long.toString bytes " +
    "(HLL + freq byte-identical to the String route)") {
    val want = referenceSketches(longs.map(String.valueOf(_)))
    val got = stateSketches(st => longs.foreach(st.trackLong))
    got._1 shouldBe want._1
    got._2 shouldBe want._2
  }

  private val doubles: Seq[Double] = Seq(
    0.0, -0.0, 1.0, -1.0, 2.5, -2.5, 0.04, 0.1, 1.0 / 3.0,
    9999999.0, -9999999.0, 1.0e7, -1.0e7, 1.23e7, 9999999.5,
    123456.0, 1234567.0, 12345678.0, 1.7976931348623157e308,
    4.9e-324, 42.0, -42.0, 3.14159, 1e-7, 1234567.0000001,
    Math.PI, Math.E, 0.5, -0.5, 100.0, 50.0) ++
    (0 until 2000).map(i => (i % 1000000).toDouble / 997.0) ++
    (0 until 500).map(_.toDouble) ++
    (0 until 500).map(i => i * 0.01)

  test("trackDouble's integral fast path renders exactly " +
    "Double.toString (HLL + freq byte-identical, -0.0 and 1e7 " +
    "boundaries included)") {
    val want = referenceSketches(doubles.map(String.valueOf(_)))
    val got = stateSketches(st => doubles.foreach(st.trackDouble))
    got._1 shouldBe want._1
    got._2 shouldBe want._2
  }

  test("ByteBuffer HLL update is hash-identical to update(String) " +
    "over UTF-8 bytes (the overload-equivalence the fast path rests on)") {
    val a = new HllSketch(12)
    val b = new HllSketch(12)
    val samples = Seq("0", "1", "-42", "12345.0", "3.14", "9999999.0")
    samples.foreach(a.update)
    samples.foreach { s =>
      b.update(java.nio.ByteBuffer.wrap(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    }
    b.toCompactByteArray shouldBe a.toCompactByteArray
  }

  test("full-state merge parity: a fast-path state merges cleanly with " +
    "a deserialized state and summarizes identically to the string route") {
    val st1 = new ColumnProfileState(ProfileConfig())
    longs.foreach(st1.trackLong)
    val st2 = ColumnProfileState.deserialize(st1.serialize())
    doubles.foreach(st2.trackDouble)
    val direct = new ColumnProfileState(ProfileConfig())
    longs.foreach(direct.trackLong)
    doubles.foreach(direct.trackDouble)
    st2.count shouldBe direct.count
    st2.hll.getEstimate shouldBe direct.hll.getEstimate
    st2.numbers.finalMin shouldBe direct.numbers.finalMin
    st2.numbers.finalMax shouldBe direct.numbers.finalMax
  }
}
