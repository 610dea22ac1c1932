package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the reference VarianceTracker values
  * (/root/reference/core/src/test/java/com/whylogs/core/statistics/datatypes/VarianceTrackerTest.java:13-98).
  */
class MomentsSpec extends AnyFunSuite with Matchers {

  test("basic mean/variance of 1,2,3") {
    val m = new Moments
    m.update(1.0); m.update(2.0); m.update(3.0)
    m.mean shouldBe 2.0 +- 0.0001
    m.variance shouldBe 1.0 +- 0.0001
    m.count shouldBe 3L
  }

  test("merge {1} with {2,3} equals direct computation") {
    val a = new Moments; a.update(1.0)
    val b = new Moments; b.update(2.0); b.update(3.0)
    a.merge(b)
    a.variance shouldBe 1.0 +- 0.0001
    a.mean shouldBe 2.0 +- 0.0001
    a.count shouldBe 3L
  }

  test("merge with empty tracker is identity (both directions)") {
    def tenVals() = {
      val m = new Moments
      (0 until 10).foreach(i => m.update(i.toDouble))
      m
    }
    val direct = tenVals()
    direct.variance shouldBe 9.1667 +- 0.0001
    direct.mean shouldBe 4.5 +- 1e-6

    val left = tenVals(); left.merge(new Moments)
    left.variance shouldBe 9.1667 +- 0.0001
    left.count shouldBe 10L
    left.mean shouldBe 4.5 +- 1e-6

    val right = new Moments; right.merge(tenVals())
    right.variance shouldBe 9.1667 +- 0.0001
    right.count shouldBe 10L
    right.mean shouldBe 4.5 +- 1e-6
  }

  test("merge of [0..9] with itself pins Chan parallel variance") {
    def tenVals() = {
      val m = new Moments
      (0 until 10).foreach(i => m.update(i.toDouble))
      m
    }
    val merged = tenVals(); merged.merge(tenVals())
    merged.variance shouldBe 8.684 +- 0.001
    merged.count shouldBe 20L
    merged.mean shouldBe 4.5 +- 1e-6
  }

  test("variance of fewer than 2 values is NaN") {
    val m = new Moments
    m.variance.isNaN shouldBe true
    m.update(42.0)
    m.variance.isNaN shouldBe true
  }

  test("min/max/sum are exact") {
    val m = new Moments
    Seq(5.0, -3.0, 7.5, 0.0).foreach(m.update)
    m.min shouldBe -3.0
    m.max shouldBe 7.5
    m.sum shouldBe 9.5
  }
}
