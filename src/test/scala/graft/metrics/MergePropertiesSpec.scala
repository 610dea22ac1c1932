package graft.metrics

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.types.InferredType

/** Property-based checks (deterministic seeded sampling) that the profile
  * state really is a commutative monoid: merge associativity/commutativity
  * on exact metrics, identity, and partition invariance — any split of the
  * input merges to the same exact metrics as tracking sequentially. This is
  * the algebra Spark's partial aggregation relies on.
  */
class MergePropertiesSpec extends AnyFunSuite with Matchers {

  private val Trials = 200

  sealed trait V
  private case class L(v: Long) extends V
  private case class D(v: Double) extends V
  private case class S(v: String) extends V
  private case class B(v: Boolean) extends V
  private case object N extends V

  private def genV(rnd: Random): V = rnd.nextInt(13) match {
    case x if x < 4 => L(rnd.nextLong() % 1000)
    case x if x < 8 => D((rnd.nextDouble() - 0.5) * 2000)
    case x if x < 11 => S(rnd.alphanumeric.take(rnd.nextInt(20)).mkString)
    case 11 => B(rnd.nextBoolean())
    case _ => N
  }

  private def genVs(rnd: Random): List[V] =
    List.fill(rnd.nextInt(60))(genV(rnd))

  private def track(st: ColumnProfileState, v: V): Unit = v match {
    case L(x) => st.trackLong(x)
    case D(x) => st.trackDouble(x)
    case S(x) => st.trackString(x)
    case B(x) => st.trackBoolean(x)
    case N    => st.trackNull()
  }

  private def profileOf(vs: Seq[V]): ColumnProfileState = {
    val st = new ColumnProfileState(ProfileConfig.default)
    vs.foreach(track(st, _))
    st
  }

  /** The exact integral fingerprint of a profile (compared bit-exactly);
    * double-valued metrics are compared separately with an ulp-scale
    * tolerance (summation order may differ across merge orders) and
    * NaN-safe equality.
    */
  private def intFingerprint(st: ColumnProfileState) = (
    st.count, st.trueCount, st.nullCount,
    st.schema.counts.toSeq,
    st.numbers.count,
    st.numbers.longCount, st.numbers.doubles.count,
    st.strings.count)

  private def dblFingerprint(st: ColumnProfileState): Seq[Double] = Seq(
    st.numbers.finalSum, st.numbers.finalMin, st.numbers.finalMax,
    st.strings.length.sum, st.strings.tokenLength.sum)

  private def assertSameProfile(a: ColumnProfileState, b: ColumnProfileState): Unit = {
    intFingerprint(a) shouldBe intFingerprint(b)
    dblFingerprint(a).zip(dblFingerprint(b)).foreach { case (x, y) =>
      if (x.isNaN || y.isNaN) x.isNaN shouldBe y.isNaN
      else x shouldBe y +- math.max(1e-9, math.abs(y) * 1e-9)
    }
  }

  test("merge is commutative on exact metrics") {
    val rnd = new Random(1)
    for (_ <- 1 to Trials) {
      val xs = genVs(rnd); val ys = genVs(rnd)
      val ab = profileOf(xs); ab.merge(profileOf(ys))
      val ba = profileOf(ys); ba.merge(profileOf(xs))
      assertSameProfile(ab, ba)
    }
  }

  test("merge is associative on exact metrics") {
    val rnd = new Random(2)
    for (_ <- 1 to Trials) {
      val xs = genVs(rnd); val ys = genVs(rnd); val zs = genVs(rnd)
      val left = profileOf(xs)
      val yz = profileOf(ys); yz.merge(profileOf(zs))
      left.merge(yz) // x . (y . z)
      val xy = profileOf(xs); xy.merge(profileOf(ys))
      xy.merge(profileOf(zs)) // (x . y) . z
      assertSameProfile(left, xy)
    }
  }

  test("empty profile is a merge identity") {
    val rnd = new Random(3)
    for (_ <- 1 to Trials) {
      val xs = genVs(rnd)
      val a = profileOf(xs)
      val withEmpty = profileOf(xs)
      withEmpty.merge(new ColumnProfileState(ProfileConfig.default))
      assertSameProfile(withEmpty, a)
      val emptyFirst = new ColumnProfileState(ProfileConfig.default)
      emptyFirst.merge(profileOf(xs))
      assertSameProfile(emptyFirst, a)
    }
  }

  test("partition invariance: any split merges to the sequential profile") {
    val rnd = new Random(4)
    for (_ <- 1 to Trials) {
      val xs = genVs(rnd)
      val nParts = 1 + rnd.nextInt(8)
      val sequential = profileOf(xs)
      val parts = xs.zipWithIndex.groupBy(_._2 % nParts).toSeq.sortBy(_._1)
        .map(p => profileOf(p._2.map(_._1)))
      val merged = new ColumnProfileState(ProfileConfig.default)
      parts.foreach(merged.merge)
      assertSameProfile(merged, sequential)
      // sketch estimates must also agree under any partitioning when
      // cardinality is below sketch capacity (everything here is)
      merged.hll.getEstimate shouldBe sequential.hll.getEstimate +- 1e-9
    }
  }

  test("serialization round-trip is lossless for exact metrics") {
    val rnd = new Random(5)
    for (_ <- 1 to Trials) {
      val st = profileOf(genVs(rnd))
      val back = ColumnProfileState.deserialize(st.serialize())
      assertSameProfile(back, st)
    }
  }

  test("NumberState merge normalization: split point never changes totals") {
    val rnd = new Random(6)
    for (_ <- 1 to Trials) {
      val vs: List[Either[Long, Double]] = List.fill(rnd.nextInt(50)) {
        if (rnd.nextBoolean()) Left(rnd.nextLong() % 100)
        else Right((rnd.nextDouble() - 0.5) * 200)
      }
      val n = 1 + rnd.nextInt(5)
      def trackAll(st: NumberState, items: Seq[Either[Long, Double]]): Unit =
        items.foreach {
          case Left(l)  => st.trackLong(l)
          case Right(d) => st.trackDouble(d)
        }
      val direct = new NumberState(256, withKll = false, withTheta = false)
      trackAll(direct, vs)
      val merged = new NumberState(256, withKll = false, withTheta = false)
      vs.zipWithIndex.groupBy(_._2 % n).toSeq.sortBy(_._1).foreach { case (_, part) =>
        val p = new NumberState(256, withKll = false, withTheta = false)
        trackAll(p, part.map(_._1))
        merged.merge(p)
      }
      merged.count shouldBe direct.count
      if (direct.count > 0) {
        merged.finalMin shouldBe direct.finalMin
        merged.finalMax shouldBe direct.finalMax
        merged.finalSum shouldBe direct.finalSum +- math.max(1e-6,
          math.abs(direct.finalSum) * 1e-9)
      }
    }
  }

  test("schema inference is stable under merge order") {
    val rnd = new Random(7)
    for (_ <- 1 to Trials) {
      def counts() = List.fill(6)(rnd.nextInt(50))
      val a = counts(); val b = counts()
      def sc(cs: Seq[Int]): SchemaCounts = {
        val s = new SchemaCounts
        cs.zipWithIndex.foreach { case (n, i) =>
          (0 until n).foreach(_ => s.track(InferredType(i)))
        }
        s
      }
      val ab = sc(a); ab.merge(sc(b))
      val ba = sc(b); ba.merge(sc(a))
      ab.inferType shouldBe ba.inferType
    }
  }
}
