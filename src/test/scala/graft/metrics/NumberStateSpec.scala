package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the reference NumberTracker's long/double split, promotion, merge,
  * and sketch bookkeeping
  * (/root/reference/core/src/test/java/com/whylogs/core/statistics/NumberTrackerTest.java:14-116).
  */
class NumberStateSpec extends AnyFunSuite with Matchers {

  private def fresh() = new NumberState(256, withKll = true, withTheta = true)

  test("long values do not increase double count") {
    val n = fresh()
    n.trackLong(10L); n.trackLong(11L); n.trackLong(12L)
    n.longCount shouldBe 3L
    n.doubles.count shouldBe 0L
    n.variance.stddev shouldBe 1.0 +- 0.001
    n.kll.getN shouldBe 3L
    n.kll.getMaxItem shouldBe 12.0f
    n.kll.getMinItem shouldBe 10.0f
  }

  test("double values do not touch long state") {
    val n = fresh()
    n.trackDouble(10.0); n.trackDouble(11.0); n.trackDouble(12.0)
    n.longCount shouldBe 0L
    n.doubles.count shouldBe 3L
    n.variance.stddev shouldBe 1.0 +- 0.001
    n.kll.getN shouldBe 3L
    n.kll.getMaxItem shouldBe 12.0f
    n.kll.getMinItem shouldBe 10.0f
  }

  test("a double after longs absorbs the long state (promotion)") {
    val n = fresh()
    n.trackLong(10L); n.trackLong(11L)
    n.longCount shouldBe 2L
    n.doubles.count shouldBe 0L
    n.trackDouble(12.0)
    n.longCount shouldBe 0L
    n.doubles.count shouldBe 3L
    n.variance.stddev shouldBe 1.0 +- 0.001
    n.kll.getN shouldBe 3L
    n.finalMin shouldBe 10.0
    n.finalMax shouldBe 12.0
    n.finalSum shouldBe 33.0
  }

  test("merge with itself doubles counts, keeps extremes; twice again") {
    def longs3() = {
      val n = fresh()
      n.trackLong(10L); n.trackLong(11L); n.trackLong(13L)
      n
    }
    val once = longs3(); once.merge(longs3())
    once.longCount shouldBe 6L
    once.doubles.count shouldBe 0L
    once.kll.getN shouldBe 6L
    once.kll.getMaxItem shouldBe 13.0f
    once.kll.getMinItem shouldBe 10.0f

    val twiceA = longs3(); twiceA.merge(longs3())
    val twiceB = longs3(); twiceB.merge(longs3())
    twiceA.merge(twiceB)
    twiceA.longCount shouldBe 12L
    twiceA.doubles.count shouldBe 0L
    twiceA.kll.getN shouldBe 12L
    twiceA.kll.getMaxItem shouldBe 13.0f
    twiceA.kll.getMinItem shouldBe 10.0f
  }

  test("merge normalizes mixed long/double sides (partition-order independent)") {
    val longs = fresh()
    longs.trackLong(1L); longs.trackLong(2L)
    val dbls = fresh()
    dbls.trackDouble(3.5)
    // either merge direction must land in double state with identical totals
    val a = fresh(); a.merge(longs); a.merge(dbls)
    val b = fresh(); b.merge(dbls); b.merge(longs)
    for (m <- Seq(a, b)) {
      m.longCount shouldBe 0L
      m.doubles.count shouldBe 3L
      m.count shouldBe 3L
      m.finalSum shouldBe 6.5
      m.finalMin shouldBe 1.0
      m.finalMax shouldBe 3.5
    }
  }

  test("serialization round-trip preserves all state") {
    val n = fresh()
    n.trackLong(10L); n.trackLong(11L); n.trackLong(13L)
    val bos = new java.io.ByteArrayOutputStream()
    n.write(new java.io.DataOutputStream(bos))
    val back = NumberState.read(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)))
    back.longCount shouldBe 3L
    back.doubles.count shouldBe 0L
    back.kll.getN shouldBe 3L
    back.kll.getMaxItem shouldBe 13.0f
    back.kll.getMinItem shouldBe 10.0f
    back.theta.getResult.getEstimate shouldBe 3.0 +- 0.001
    back.variance.mean shouldBe n.variance.mean
  }

  test("theta distinct estimate is exact below sketch capacity") {
    val n = fresh()
    (0 until 1000).foreach(i => n.trackLong(i.toLong))
    (0 until 1000).foreach(i => n.trackLong(i.toLong)) // duplicates
    n.theta.getResult.getEstimate shouldBe 1000.0 +- 0.001
  }

  test("KLL median of uniform longs is near the true median") {
    val n = fresh()
    (1 to 10000).foreach(i => n.trackLong(i.toLong))
    val med = n.kll.getQuantile(0.5).toDouble
    med shouldBe 5000.0 +- (10000 * 0.02) // eps(k=256) ~ 1.7%
  }
}
