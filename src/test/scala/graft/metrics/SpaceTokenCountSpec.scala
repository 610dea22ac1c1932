package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the allocation-free token-count walk to Java `String.split(" ")`
  * semantics — the reference's tokenizer (StringTracker.java:63-90 uses
  * value.split(" ")) drops trailing empty tokens but keeps leading and
  * interior ones. The old split-based implementation is kept HERE as the
  * oracle.
  */
class SpaceTokenCountSpec extends AnyFunSuite with Matchers {

  private def splitOracle(s: String): Int = {
    val parts = s.split(" ", -1)
    var end = parts.length
    while (end > 0 && parts(end - 1).isEmpty) end -= 1
    end
  }

  test("hand cases") {
    for ((s, n) <- Seq("" -> 0, " " -> 0, "   " -> 0, "x" -> 1,
      "a b" -> 2, "a  b" -> 3, " a" -> 2, "a b  " -> 2, "  a b " -> 4,
      "hello world again" -> 3, "\ttab  not a space\t" -> 5)) {
      withClue(s"'$s': ") {
        StringState.spaceTokenCount(s) shouldBe n
        splitOracle(s) shouldBe n
      }
    }
  }

  test("randomized parity with String.split(\" \")") {
    val rnd = new scala.util.Random(0x70C3)
    val alphabet = "ab é世  "
    (0 until 5000).foreach { _ =>
      val s = (0 until rnd.nextInt(30))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      withClue(s"'$s': ") {
        StringState.spaceTokenCount(s) shouldBe splitOracle(s)
      }
    }
  }
}
