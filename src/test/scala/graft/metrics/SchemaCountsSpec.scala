package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.types.InferredType
import graft.types.InferredType._

/** Pins the reference's schema-inference thresholds
  * (/root/reference/core/src/test/java/com/whylogs/core/statistics/SchemaTrackerTest.java:43-111).
  */
class SchemaCountsSpec extends AnyFunSuite with Matchers {

  private def tracker(pairs: (InferredType.InferredType, Int)*): SchemaCounts = {
    val s = new SchemaCounts
    pairs.foreach { case (t, n) => (0 until n).foreach(_ => s.track(t)) }
    s
  }

  test("nothing tracked infers UNKNOWN with ratio 0") {
    val (t, r) = new SchemaCounts().inferType
    t shouldBe Unknown
    r shouldBe 0.0
  }

  test("per-type counts are exact") {
    val s = tracker(Integral -> 2, String -> 2, Fractional -> 1,
      Boolean -> 2, Unknown -> 2)
    s.get(Integral) shouldBe 2L
    s.get(String) shouldBe 2L
    s.get(Fractional) shouldBe 1L
    s.get(Boolean) shouldBe 2L
    s.get(Unknown) shouldBe 2L
    s.total shouldBe 9L
  }

  test("over 70% string wins outright") {
    val (t, _) = tracker(Integral -> 29, String -> 71).inferType
    t shouldBe String
  }

  test("majority fractional (51%) infers FRACTIONAL") {
    val (t, _) =
      tracker(Fractional -> 51, String -> 30, Unknown -> 20).inferType
    t shouldBe Fractional
  }

  test("exactly half fractional cannot infer (UNKNOWN)") {
    val (t, r) =
      tracker(Fractional -> 50, String -> 30, Unknown -> 20).inferType
    t shouldBe Unknown
    r shouldBe 1.0
  }

  test("majority integral (51%) infers INTEGRAL") {
    val (t, _) =
      tracker(Integral -> 51, String -> 30, Unknown -> 20).inferType
    t shouldBe Integral
  }

  test("integral+fractional combined majority coerces to FRACTIONAL") {
    val (t, r) =
      tracker(Integral -> 50, Fractional -> 50, String -> 10).inferType
    t shouldBe Fractional
    r shouldBe (100.0 / 110.0) +- 1e-12
  }

  test("string beating combined numerics absorbs them (coerced to STRING)") {
    val (t, r) =
      tracker(Integral -> 20, Fractional -> 29, String -> 50).inferType
    t shouldBe String
    r shouldBe (99.0 / 99.0) +- 1e-12
  }

  test("string NOT beating combined numerics does not absorb") {
    // string is most popular but 40 <= 25+25 numerics -> falls through;
    // fractional combined 50/90 > 0.5 -> FRACTIONAL
    val (t, _) =
      tracker(Integral -> 25, Fractional -> 25, String -> 40).inferType
    t shouldBe Fractional
  }

  test("merge adds per-type counts") {
    val a = tracker(Integral -> 10, Fractional -> 10, Boolean -> 10, Unknown -> 10)
    val b = tracker(Integral -> 20, Fractional -> 20, Boolean -> 20, Unknown -> 20)
    a.merge(b)
    a.get(Integral) shouldBe 30L
    a.get(Fractional) shouldBe 30L
    a.get(Boolean) shouldBe 30L
    a.get(Unknown) shouldBe 30L
  }

  test("serialization round-trip preserves counts") {
    val s = tracker(Integral -> 10, String -> 100)
    val bos = new java.io.ByteArrayOutputStream()
    s.write(new java.io.DataOutputStream(bos))
    val back = SchemaCounts.read(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)))
    back.get(Integral) shouldBe 10L
    back.get(String) shouldBe 100L
    back.inferType shouldBe s.inferType
  }
}
