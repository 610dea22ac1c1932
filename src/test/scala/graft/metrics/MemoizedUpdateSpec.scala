package graft.metrics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Parity contract for the r17 repeat-value memo: a memo HIT skips the
  * String render and the HLL + theta updates for a value the state has
  * provably already tracked, so the resulting state must be
  * INDISTINGUISHABLE from the memo-disabled path. The skip is sound
  * because datasketches HLL and theta are byte-level idempotent — pinned
  * here directly against the library (not just through the profile), on
  * compact AND updatable images, across LIST/SET/HLL mode transitions.
  * Same KLL caveat as BufferedUpdateSpec: below compaction the whole
  * serialized state is byte-exact; above it KLL bytes are already
  * non-deterministic (JVM-shared static Random), so the contract is
  * component-wise byte-exactness for every deterministic section.
  */
class MemoizedUpdateSpec extends AnyFunSuite with Matchers {

  import org.apache.datasketches.common.ArrayOfStringsSerDe

  private def feed(st: ColumnProfileState, vals: Seq[Any]): Unit =
    vals.foreach {
      case l: Long => st.trackLong(l)
      case d: Double => st.trackDouble(d)
      case null => st.trackNull()
      case b: Boolean => st.trackBoolean(b)
      case s: String => st.trackString(s)
    }

  private def pair(vals: Seq[Any]): (ColumnProfileState, ColumnProfileState) = {
    val memo = new ColumnProfileState(ProfileConfig())
    val plain = new ColumnProfileState(ProfileConfig())
    plain.memoDisabled = true
    feed(memo, vals); feed(plain, vals)
    (memo, plain)
  }

  private val rnd = new scala.util.Random(0x17C0FFEE)

  /** duplicate-heavy mix: low-cardinality longs and doubles (the memo's
    * target), occasional high-cardinality values (guaranteed misses),
    * nulls, booleans, signed zeros, and numeric-looking strings that
    * share HLL text space with rendered numbers.
    */
  private def dupHeavy(n: Int): Seq[Any] = (0 until n).map { _ =>
    rnd.nextInt(12) match {
      case 0 => null
      case 1 => rnd.nextBoolean()
      case 2 => if (rnd.nextBoolean()) 0.0 else -0.0
      case 3 => rnd.nextLong() // high-cardinality miss traffic
      case 4 => rnd.nextDouble() * 1e12 // fractional, high-card
      case 5 => String.valueOf(rnd.nextInt(7)) // text "0".."6"
      case k if k < 9 => rnd.nextInt(7).toLong // hot longs
      case _ => (rnd.nextInt(11) * 0.01 + 5.0) * (rnd.nextInt(3) + 1) // hot doubles
    }
  }

  test("duplicate-heavy mixed stream serializes byte-identically " +
    "below KLL compaction") {
    for (n <- Seq(1, 40, 200, 255)) {
      // keep numeric count under k=256 so KLL never compacts
      val vals = dupHeavy(n).take(250)
      val (m, p) = pair(vals)
      withClue(s"n=$n: ") { m.serialize() shouldBe p.serialize() }
    }
  }

  private def deterministicSections(st: ColumnProfileState)
      : (Long, Long, Long, Seq[Byte], Seq[Byte], Seq[Byte],
         Double, Double, Long) = {
    st.flush()
    (st.count, st.trueCount, st.nullCount,
      st.hll.toCompactByteArray.toSeq,
      st.freq.toByteArray(new ArrayOfStringsSerDe).toSeq,
      st.numbers.theta.getResult.toByteArray.toSeq,
      st.numbers.finalMin, st.numbers.finalMax,
      st.numbers.kll.getN)
  }

  test("at compaction scale every deterministic section is byte-identical") {
    val vals = dupHeavy(30000)
    val (m, p) = pair(vals)
    deterministicSections(m) shouldBe deterministicSections(p)
  }

  test("long/double raw-bit collisions and same-slot collisions stay exact") {
    // same raw bits, different kind: 5L vs longBitsToDouble(5) — a memo
    // that ignored kind would feed freq the wrong string / skip the
    // wrong theta domain
    val bitTwins: Seq[Any] = Seq.fill(50)(Seq[Any](
      5L, java.lang.Double.longBitsToDouble(5L),
      -1L, java.lang.Double.longBitsToDouble(-1L) // -1 bits = NaN → null path
    )).flatten
    val (m1, p1) = pair(bitTwins)
    m1.serialize() shouldBe p1.serialize()
    // values that collide in the 128-slot direct map evict each other;
    // alternating them forces store/evict churn — parity must hold
    val a = 3L
    val b = (0x8000000L until 0x8010000L).find(c =>
      (((c * 0x9E3779B97F4A7C15L) >>> 57) & 127L) ==
        (((a * 0x9E3779B97F4A7C15L) >>> 57) & 127L)).get
    val churn: Seq[Any] = Seq.fill(60)(Seq[Any](a, b)).flatten
    val (m2, p2) = pair(churn)
    m2.serialize() shouldBe p2.serialize()
  }

  test("merge with warm memos equals the direct merge (below compaction)") {
    val a = dupHeavy(120)
    val c = dupHeavy(80)
    val (ma, pa) = (pair(a), pair(c)) match {
      case ((m1, p1), (m2, p2)) => m1.merge(m2); p1.merge(p2); (m1, p1)
    }
    ma.serialize() shouldBe pa.serialize()
  }

  test("string memo: duplicate-heavy strings (short, long, charpos on) " +
    "serialize byte-identically") {
    val words = Seq("alpha", "beta", "N", "F", "RETURN", "true", "false", "")
    val long = Seq.fill(3)(rnd.nextString(300)) // > 64 chars: never memoized
    val vals: Seq[Any] = (0 until 240).map { _ =>
      if (rnd.nextInt(10) == 0) long(rnd.nextInt(long.size))
      else words(rnd.nextInt(words.size))
    }
    val (m, p) = pair(vals)
    m.serialize() shouldBe p.serialize()
    // with char-position tracking on (per-occurrence state after the
    // memo's theta/hll skip)
    val cfg = ProfileConfig(withCharPos = true)
    val mc = new ColumnProfileState(cfg)
    val pc = new ColumnProfileState(cfg); pc.memoDisabled = true
    feed(mc, vals); feed(pc, vals)
    mc.serialize() shouldBe pc.serialize()
  }

  test("string memo slot collisions (same hashCode & 63) stay exact") {
    // craft strings landing in one slot: vary until two share hash&63
    val base = (0 until 2000).map(i => s"k$i")
    val bySlot = base.groupBy(_.hashCode & 63).values.find(_.size >= 3).get
    val vals: Seq[Any] = Seq.fill(50)(bySlot.take(3)).flatten
    val (m, p) = pair(vals)
    m.serialize() shouldBe p.serialize()
  }

  test("boolean seen-flags: mixed booleans serialize byte-identically") {
    val vals: Seq[Any] = (0 until 300).map(_ => rnd.nextBoolean())
    val (m, p) = pair(vals)
    m.serialize() shouldBe p.serialize()
  }

  test("datasketches HLL update is byte-level idempotent across " +
    "LIST/SET/HLL modes (compact and updatable images)") {
    import org.apache.datasketches.hll.HllSketch
    val r = new scala.util.Random(42)
    val all = new HllSketch(12); val dedup = new HllSketch(12)
    val seen = scala.collection.mutable.HashSet.empty[Int]
    (0 until 300000).foreach { _ =>
      val v = r.nextInt(60000) // crosses LIST → SET → HLL
      val s = String.valueOf(v)
      all.update(s)
      if (seen.add(v)) dedup.update(s)
    }
    all.toCompactByteArray.toSeq shouldBe dedup.toCompactByteArray.toSeq
    all.toUpdatableByteArray.toSeq shouldBe dedup.toUpdatableByteArray.toSeq
    // low-cardinality LIST-mode case
    val a2 = new HllSketch(12); val d2 = new HllSketch(12)
    seen.clear()
    (0 until 1000).foreach { _ =>
      val v = r.nextInt(5); val s = String.valueOf(v)
      a2.update(s)
      if (seen.add(v)) d2.update(s)
    }
    a2.toCompactByteArray.toSeq shouldBe d2.toCompactByteArray.toSeq
  }

  test("datasketches theta Union update is byte-level idempotent") {
    import org.apache.datasketches.theta.SetOperation
    val r = new scala.util.Random(7)
    val all = SetOperation.builder().buildUnion()
    val dedup = SetOperation.builder().buildUnion()
    val seen = scala.collection.mutable.HashSet.empty[Double]
    (0 until 200000).foreach { _ =>
      val v = r.nextInt(30000).toDouble
      all.update(v)
      if (seen.add(v)) dedup.update(v)
    }
    all.getResult.toByteArray.toSeq shouldBe dedup.getResult.toByteArray.toSeq
    all.getResult.toByteArrayCompressed.toSeq shouldBe
      dedup.getResult.toByteArrayCompressed.toSeq
  }
}
