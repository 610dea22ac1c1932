package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Parity contract for the r17 numeric update buffer: buffering only
  * DELAYS a state's own update subsequence, so the state must be
  * indistinguishable from one updated directly. Below KLL compaction
  * the WHOLE serialized state is byte-identical; above it the KLL
  * bytes are already non-deterministic across independent builds
  * (datasketches KLL draws compaction halving from a JVM-shared static
  * Random — verified: two DIRECT builds over identical input differ),
  * so at scale the contract is component-wise: every deterministic
  * section byte-identical (HLL, freq, theta, counters, moments,
  * min/max), KLL n/min/max exact and quantiles within sketch error.
  */
class BufferedUpdateSpec extends AnyFunSuite with Matchers {

  import org.apache.datasketches.common.ArrayOfStringsSerDe

  private def feedDirect(st: ColumnProfileState, vals: Seq[Any]): Unit =
    vals.foreach {
      case l: Long => st.trackLong(l)
      case d: Double => st.trackDouble(d)
      case null => st.trackNull()
      case b: Boolean => st.trackBoolean(b)
    }

  private def feedBuffered(st: ColumnProfileState, vals: Seq[Any]): Unit =
    vals.foreach {
      case l: Long => st.bufferLong(l)
      case d: Double => st.bufferDouble(d)
      case null => st.trackNull()
      case b: Boolean => st.trackBoolean(b)
    }

  private val rnd = new scala.util.Random(0xBEEF)
  private def randomVals(n: Int): Seq[Any] = (0 until n).map { _ =>
    rnd.nextInt(10) match {
      case 0 => null
      case k if k < 5 => rnd.nextLong() % 100000L
      case k if k < 8 => rnd.nextDouble() * 1000.0
      case _ => (rnd.nextInt(2000) - 1000).toDouble // integral doubles
    }
  }

  test("below KLL compaction the buffered state serializes " +
    "byte-identically across buffer-boundary sizes (1, 255, 256, 257)") {
    for (n <- Seq(1, 17, 255, 256, 257)) {
      val vals = randomVals(n)
      val d = new ColumnProfileState(ProfileConfig()); feedDirect(d, vals)
      val b = new ColumnProfileState(ProfileConfig()); feedBuffered(b, vals)
      withClue(s"n=$n: ") { b.serialize() shouldBe d.serialize() }
    }
  }

  private def deterministicSections(st: ColumnProfileState)
      : (Long, Long, Long, Seq[Byte], Seq[Byte], Seq[Byte],
         Double, Double, Long) = {
    st.flush()
    // arrays become Seqs: shouldBe only deep-compares TOP-LEVEL arrays,
    // not arrays nested in a tuple (reference equality otherwise)
    (st.count, st.trueCount, st.nullCount,
      st.hll.toCompactByteArray.toSeq,
      st.freq.toByteArray(new ArrayOfStringsSerDe).toSeq,
      st.numbers.theta.getResult.toByteArray.toSeq,
      st.numbers.finalMin, st.numbers.finalMax,
      st.numbers.kll.getN)
  }

  test("at compaction scale every deterministic section is " +
    "byte-identical and the KLL agrees on n/min/max + quantiles") {
    val vals = randomVals(20000)
    val d = new ColumnProfileState(ProfileConfig()); feedDirect(d, vals)
    val b = new ColumnProfileState(ProfileConfig()); feedBuffered(b, vals)
    deterministicSections(b) shouldBe deterministicSections(d)
    d.numbers.kll.getMinItem shouldBe b.numbers.kll.getMinItem
    d.numbers.kll.getMaxItem shouldBe b.numbers.kll.getMaxItem
    // KLL guarantees normalized RANK error (~1.7% at k=256), not value
    // error — compare in rank space: each sketch's q-quantile must sit
    // at rank ~q in the OTHER sketch (two independent random compaction
    // streams, so 2x the single-sketch bound + slack)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val dq = d.numbers.kll.getQuantile(q)
      val bq = b.numbers.kll.getQuantile(q)
      math.abs(d.numbers.kll.getRank(bq) - q) should be <= 0.05
      math.abs(b.numbers.kll.getRank(dq) - q) should be <= 0.05
    }
  }

  test("merge flushes both sides: half-full buffers merged equal the " +
    "direct merge (below compaction, byte-exact)") {
    // total numeric count stays under k=256 so the KLL MERGE itself
    // never compacts (randomized) — byte-exact is only promised there
    val a = randomVals(150).filter(_ != null).take(120)
    val c = randomVals(80)
    val da = new ColumnProfileState(ProfileConfig()); feedDirect(da, a)
    val dc = new ColumnProfileState(ProfileConfig()); feedDirect(dc, c)
    da.merge(dc)
    val ba = new ColumnProfileState(ProfileConfig()); feedBuffered(ba, a)
    val bc = new ColumnProfileState(ProfileConfig()); feedBuffered(bc, c)
    ba.merge(bc)
    ba.serialize() shouldBe da.serialize()
  }
}
