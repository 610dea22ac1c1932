package graft.functions

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bounded top-k buffer must be a commutative monoid under merge —
  * that is what lets Catalyst run it as a partial+final aggregate: any
  * partitioning of the input, inserted in any order, merges to the same
  * sorted top-k.
  */
class TopKStateSpec extends AnyFunSuite with Matchers {

  private val Trials = 200
  private val ord: Ordering[Any] =
    Ordering.by[Any, Long](_.asInstanceOf[Long])

  private def bulk(k: Int, xs: Seq[(Double, Long)]): TopKState = {
    val st = new TopKState(k, ord)
    xs.foreach { case (s, i) => st.insert(s, i) }
    st
  }

  private def expected(k: Int, xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.distinct // state never sees duplicate (score, id) pairs in the tests
      .sortWith { case ((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 < i2) }
      .take(k)

  test("insert order does not change the result") {
    val rnd = new Random(7)
    (1 to Trials).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val xs = List.fill(rnd.nextInt(50))(
        (rnd.nextInt(10).toDouble, rnd.nextLong() % 1000)).distinct
      val a = bulk(k, xs).sorted.map { case (s, i) => (s, i.asInstanceOf[Long]) }
      val b = bulk(k, rnd.shuffle(xs)).sorted
        .map { case (s, i) => (s, i.asInstanceOf[Long]) }
      a.toSeq shouldBe b.toSeq
      a.toSeq shouldBe expected(k, xs)
    }
  }

  test("any partition split merges to the sequential result") {
    val rnd = new Random(11)
    (1 to Trials).foreach { _ =>
      val k = 1 + rnd.nextInt(6)
      val xs = List.fill(1 + rnd.nextInt(60))(
        (rnd.nextDouble() * 10, rnd.nextLong() % 10000)).distinct
      val cut = rnd.nextInt(xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val left = bulk(k, l)
      val right = bulk(k, r)
      left.merge(right)
      left.sorted.map { case (s, i) => (s, i.asInstanceOf[Long]) }.toSeq shouldBe
        expected(k, xs)
    }
  }

  test("score ties break by smaller id") {
    val st = bulk(2, Seq((1.0, 30L), (1.0, 10L), (1.0, 20L)))
    st.sorted.map(_._2.asInstanceOf[Long]).toSeq shouldBe Seq(10L, 20L)
  }
}
