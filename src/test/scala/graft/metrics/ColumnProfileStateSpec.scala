package graft.metrics

import org.apache.datasketches.frequencies.ErrorType
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.types.InferredType

/** Pins the reference ColumnProfile's null semantics, merge behavior,
  * string truncation, and frequent-items sanity
  * (/root/reference/core/src/test/java/com/whylogs/core/ColumnProfileTest.java:17-208).
  */
class ColumnProfileStateSpec extends AnyFunSuite with Matchers {

  private def mixedSix(cfg: ProfileConfig = ProfileConfig.default) = {
    val c = new ColumnProfileState(cfg)
    c.trackLong(1L)
    c.trackDouble(1.0)
    c.trackString("string")
    c.trackBoolean(true)
    c.trackBoolean(false)
    c.trackNull()
    c
  }

  test("basic tracking: counts, null, true, long->double promotion") {
    val c = mixedSix()
    c.count shouldBe 6L
    c.schema.get(InferredType.Null) shouldBe 1L
    c.trueCount shouldBe 1L
    // 1L then 1.0: the double absorbs the long state (reference semantics)
    c.numbers.longCount shouldBe 0L
    c.numbers.doubles.count shouldBe 2L
  }

  test("null-string set, NaN and +-Inf all count as NULL") {
    val cfg = ProfileConfig(nullStrings = Set("nil", "NaN", "nan", "null"))
    val c = mixedSix(cfg)
    c.trackDouble(Double.NaN)
    c.trackDouble(Double.NegativeInfinity)
    c.trackDouble(Double.PositiveInfinity)
    c.trackString("") // NOT in the null set -> plain string
    c.count shouldBe 10L
    c.schema.get(InferredType.Null) shouldBe 4L
    c.trueCount shouldBe 1L
    c.numbers.longCount shouldBe 0L
    c.numbers.doubles.count shouldBe 2L
  }

  test("a lone NaN counts as NULL, not as a numeric value") {
    val c = new ColumnProfileState(ProfileConfig.default)
    c.trackDouble(Double.NaN)
    c.count shouldBe 1L
    c.schema.get(InferredType.Null) shouldBe 1L
    c.trueCount shouldBe 0L
    c.numbers.longCount shouldBe 0L
    c.numbers.doubles.count shouldBe 0L
  }

  test("null strings in the configured set count as NULL") {
    val cfg = ProfileConfig(nullStrings = Set("nil", "NaN"))
    val c = new ColumnProfileState(cfg)
    c.trackString("nil"); c.trackString("NaN"); c.trackString("ok")
    c.count shouldBe 3L
    c.schema.get(InferredType.Null) shouldBe 2L
    c.schema.get(InferredType.String) shouldBe 1L
    c.strings.count shouldBe 1L
  }

  test("merge with itself doubles every counter and stays updatable") {
    val merged = mixedSix()
    merged.merge(mixedSix())
    merged.count shouldBe 12L
    merged.schema.get(InferredType.Null) shouldBe 2L
    merged.trueCount shouldBe 2L
    merged.numbers.longCount shouldBe 0L
    merged.numbers.doubles.count shouldBe 4L
    noException should be thrownBy merged.trackString("value")
  }

  test("strings longer than 256 chars are truncated before sketching") {
    val c = new ColumnProfileState(ProfileConfig.default)
    c.trackString("superlongstring" * 24) // 360 chars
    c.merge({ val d = new ColumnProfileState(ProfileConfig.default)
      d.trackString("superlongstring" * 24); d })
    val items = c.freq.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
    items should not be empty
    all(items.map(_.getItem.length).toSeq) should be <= 256
  }

  test("1000 distinct numeric strings stay within frequent-items bound") {
    val c = new ColumnProfileState(ProfileConfig.default)
    (0 until 1000).foreach(i => c.trackString(String.valueOf(i)))
    c.freq.getNumActiveItems should be < 40
    val items = c.freq.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    items.foreach(r => noException should be thrownBy Integer.parseInt(r.getItem))
  }

  test("1000 distinct numeric values stay within frequent-items bound") {
    val c = new ColumnProfileState(ProfileConfig.default)
    (0 until 1000).foreach(i => c.trackLong(i.toLong))
    c.freq.getNumActiveItems should be < 40
  }

  test("string-matching classifies numeric/boolean strings (opt-in)") {
    val cfg = ProfileConfig(stringMatching = true)
    val c = new ColumnProfileState(cfg)
    c.trackString("42")
    c.trackString("-7")
    c.trackString("3.14")
    c.trackString("1e5")
    c.trackString("true")
    c.trackString("plain")
    c.schema.get(InferredType.Integral) shouldBe 2L
    c.schema.get(InferredType.Fractional) shouldBe 2L
    c.schema.get(InferredType.Boolean) shouldBe 1L
    c.schema.get(InferredType.String) shouldBe 1L
    c.trueCount shouldBe 1L
    c.numbers.count shouldBe 4L
  }

  test("serialization round-trip preserves the full profile") {
    val c = mixedSix()
    val back = ColumnProfileState.deserialize(c.serialize())
    back.count shouldBe 6L
    back.trueCount shouldBe 1L
    back.nullCount shouldBe 1L
    back.numbers.doubles.count shouldBe 2L
    back.strings.count shouldBe 1L
    back.hll.getEstimate shouldBe c.hll.getEstimate
    back.schema.inferType shouldBe c.schema.inferType
    // round-tripped state must still merge and update
    back.merge(mixedSix())
    back.count shouldBe 12L
  }

  test("HLL cardinality counts distinct stringified values") {
    val c = new ColumnProfileState(ProfileConfig.default)
    (0 until 500).foreach(i => c.trackLong((i % 50).toLong))
    c.hll.getEstimate shouldBe 50.0 +- 1.0
  }
}
