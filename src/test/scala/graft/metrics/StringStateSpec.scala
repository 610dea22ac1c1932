package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the reference StringTracker's length/token semantics and the
  * CharPosTracker's pooling behavior
  * (/root/reference/core/src/test/java/com/whylogs/core/ColumnProfileTest.java:108-123,
  * /root/reference/core/src/main/java/com/whylogs/core/statistics/datatypes/CharPosTracker.java:48-120).
  */
class StringStateSpec extends AnyFunSuite with Matchers {

  test("Shakespeare line: length 51, token count 8 (reference pinned)") {
    val s = new StringState(withTheta = true, withCharPos = false)
    s.update("But, soft! what light through yonder window breaks?")
    s.count shouldBe 1L
    s.length.max shouldBe 51.0
    s.tokenLength.max shouldBe 8.0
  }

  test("token count follows Java split-on-space semantics") {
    // trailing empties dropped, interior empties kept
    StringState.spaceTokenCount("a b c") shouldBe 3
    StringState.spaceTokenCount("a  b") shouldBe 3 // interior empty kept
    StringState.spaceTokenCount("a b   ") shouldBe 2 // trailing dropped
    StringState.spaceTokenCount("") shouldBe 0
    StringState.spaceTokenCount(" ") shouldBe 0
    StringState.spaceTokenCount("  a") shouldBe 3 // leading empties kept
  }

  test("theta distinct over strings is exact below capacity") {
    val s = new StringState(withTheta = true, withCharPos = false)
    (0 until 300).foreach(i => s.update(s"item_${i % 100}"))
    s.count shouldBe 300L
    s.theta.getResult.getEstimate shouldBe 100.0 +- 0.001
  }

  test("merge adds counts and unions distincts") {
    val a = new StringState(withTheta = true, withCharPos = false)
    val b = new StringState(withTheta = true, withCharPos = false)
    (0 until 50).foreach(i => a.update(s"a_$i"))
    (0 until 50).foreach(i => b.update(s"b_$i"))
    a.merge(b)
    a.count shouldBe 100L
    a.theta.getResult.getEstimate shouldBe 100.0 +- 0.001
    a.length.count shouldBe 100L
  }

  test("char positions: lowercased, out-of-charset pooled under NITL") {
    val s = new CharPosState(CharPosState.DefaultCharset)
    s.update("Ab~")
    // 'a' (lowercased A) at 0, 'b' at 1, '~' pooled at 2
    s.perChar('a').count shouldBe 1L
    s.perChar('a').min shouldBe 0.0
    s.perChar('b').count shouldBe 1L
    s.perChar('b').min shouldBe 1.0
    s.perChar('\u0000').count shouldBe 1L
    s.perChar('\u0000').min shouldBe 2.0
  }

  test("char position moments accumulate across updates and merges") {
    val a = new CharPosState(CharPosState.DefaultCharset)
    a.update("aa") // 'a' at 0, 1
    val b = new CharPosState(CharPosState.DefaultCharset)
    b.update("ba") // 'a' at 1
    a.merge(b)
    a.perChar('a').count shouldBe 3L
    a.perChar('a').sum shouldBe 2.0
    a.perChar('b').count shouldBe 1L
  }

  test("charset change resets the tracker; same-set charset does not") {
    val cp = new CharPosState("abc")
    cp.update("abc")
    cp.perChar('a').count shouldBe 1L
    // same SET in different order: no reset (reference compares the set,
    // CharPosTracker.java:105-114)
    cp.update("cab", "cba")
    cp.perChar('a').count shouldBe 2L
    // different set: ambiguous NITL pool -> state resets, then tracks
    cp.update("xa", "xyz")
    cp.charset shouldBe "xyz"
    cp.perChar.get('a') shouldBe None // old state gone; 'a' now pools NITL
    cp.perChar('x').count shouldBe 1L
    cp.perChar('\u0000').count shouldBe 1L // 'a' under the NITL slot
  }

  test("merging different charsets unions the tracked sets") {
    val a = new CharPosState("ab")
    a.update("ab")
    val b = new CharPosState("cd")
    b.update("cd")
    a.merge(b)
    a.charset.toSet shouldBe Set('a', 'b', 'c', 'd')
    a.perChar('a').count shouldBe 1L
    a.perChar('c').count shouldBe 1L
  }

  test("serialization round-trip") {
    val s = new StringState(withTheta = true, withCharPos = true)
    s.update("hello world")
    s.update("foo")
    val bos = new java.io.ByteArrayOutputStream()
    s.write(new java.io.DataOutputStream(bos))
    val back = StringState.read(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)))
    back.count shouldBe 2L
    back.length.min shouldBe 3.0
    back.length.max shouldBe 11.0
    back.tokenLength.max shouldBe 2.0
    back.theta.getResult.getEstimate shouldBe 2.0 +- 0.001
    back.charPos.perChar('o').count shouldBe 4L // hello world: 2, foo: 2
  }
}
