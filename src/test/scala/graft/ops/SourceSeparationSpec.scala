package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[Similarity.sourceSeparation]] — the per-source embedding
  * cohesion/confusion report: hand-built geometry where the verdicts
  * are computable by inspection.
  */
class SourceSeparationSpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  test("hand-built clusters: cohesive axis clusters separate; a " +
    "colinear source confuses toward its twin; singleton key has " +
    "NULL nearest") {
    import spark.implicits._
    // a: tight around x-axis; b: tight around y-axis; c: ALSO x-axis
    // (the mislabeled/duplicated source the report exists to expose)
    val rows = Seq(
      ("a", Seq(1.0f, 0.1f)), ("a", Seq(1.0f, -0.1f)),
      ("b", Seq(0.1f, 1.0f)), ("b", Seq(-0.1f, 1.0f)),
      ("c", Seq(1.0f, 0.05f)), ("c", Seq(1.0f, -0.05f)))
      .toDF("src", "emb")
    val got = Similarity.sourceSeparation(rows, "src", "emb")
      .collect().map(r => r.getString(0) -> r).toMap
    got.keySet shouldBe Set("a", "b", "c")
    got("a").getLong(1) shouldBe 2L
    // a's centroid is (1, 0): members at +-0.1 tilt, cosine ~0.995
    got("a").getDouble(3) should be > 0.99
    // a's nearest other centroid is c (colinear), not b (orthogonal)
    got("a").getString(4) shouldBe "c"
    got("a").getDouble(5) should be > 0.99
    // so a vs c separation collapses toward 0...
    got("a").getDouble(6) should be < 0.02
    // ...while b separates cleanly from both x-axis sources
    got("b").getString(4) should (be("a") or be("c"))
    got("b").getDouble(5) should be < 0.2
    got("b").getDouble(6) should be > 0.8

    // singleton input: no peer centroid -> NULL nearest/separation
    val solo = Seq(("only", Seq(1.0f, 0.0f))).toDF("src", "emb")
    val one = Similarity.sourceSeparation(solo, "src", "emb")
      .collect().head
    one.getLong(1) shouldBe 1L
    one.isNullAt(4) shouldBe true
    one.isNullAt(6) shouldBe true
  }

  test("centroid math: intra_cos is exactly 1 when every member IS " +
    "the centroid direction") {
    import spark.implicits._
    val rows = Seq(
      ("k", Seq(2.0f, 0.0f)), ("k", Seq(4.0f, 0.0f)),
      ("m", Seq(0.0f, 1.0f)))
      .toDF("src", "emb")
    val got = Similarity.sourceSeparation(rows, "src", "emb")
      .collect().map(r => r.getString(0) -> r).toMap
    got("k").getDouble(3) shouldBe (1.0 +- 1e-12)
    got("k").getDouble(2) shouldBe (3.0 +- 1e-12) // centroid (3, 0)
    got("k").getDouble(5) shouldBe (0.0 +- 1e-12) // orthogonal m
    got("k").getDouble(6) shouldBe (1.0 +- 1e-12)
  }
}
