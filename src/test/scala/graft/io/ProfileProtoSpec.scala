package graft.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileInputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.metrics.{ColumnProfileState, ProfileConfig}
import graft.types.InferredType

/** Round-trip and cross-implementation checks of the DatasetProfileMessage
  * codec. Interop fixtures are profiles written by the REFERENCE's Python
  * implementation (core/src/test/resources/python_profile.bin) — parsing
  * them proves wire compatibility with profiles our engine did not write.
  */
class ProfileProtoSpec extends AnyFunSuite with Matchers {

  private def sampleColumn(): ColumnProfileState = {
    val st = new ColumnProfileState(ProfileConfig.default)
    (1 to 100).foreach(i => st.trackLong(i.toLong))
    st.trackDouble(3.5)
    st.trackString("hello world")
    st.trackString("foo")
    st.trackBoolean(true)
    st.trackNull()
    st
  }

  test("write -> parse round trip preserves exact metrics") {
    val profile = ProfileProto.DatasetProfile(
      "session-1", 1700000000000L, Some(1699999999999L),
      Map("env" -> "test"), Map("who" -> "spec"),
      Map("c1" -> sampleColumn()))
    val back = ProfileProto.fromBytes(ProfileProto.toBytes(profile))

    back.sessionId shouldBe "session-1"
    back.sessionTimestamp shouldBe 1700000000000L
    back.dataTimestamp shouldBe Some(1699999999999L)
    back.tags shouldBe Map("env" -> "test")
    back.metadata shouldBe Map("who" -> "spec")

    val c = back.columns("c1")
    val orig = sampleColumn()
    c.count shouldBe orig.count
    c.trueCount shouldBe orig.trueCount
    c.nullCount shouldBe orig.nullCount
    c.schema.get(InferredType.Integral) shouldBe 100L
    c.schema.get(InferredType.Fractional) shouldBe 1L
    c.schema.get(InferredType.String) shouldBe 2L
    c.numbers.count shouldBe orig.numbers.count
    c.numbers.finalMin shouldBe orig.numbers.finalMin
    c.numbers.finalMax shouldBe orig.numbers.finalMax
    c.numbers.finalSum shouldBe orig.numbers.finalSum
    c.numbers.variance.mean shouldBe orig.numbers.variance.mean
    c.numbers.variance.m2 shouldBe orig.numbers.variance.m2
    c.numbers.kll.getN shouldBe orig.numbers.kll.getN
    c.numbers.theta.getResult.getEstimate shouldBe
      orig.numbers.theta.getResult.getEstimate
    c.strings.count shouldBe orig.strings.count
    c.strings.length.max shouldBe orig.strings.length.max
    c.strings.length.sum shouldBe orig.strings.length.sum
    c.strings.tokenLength.max shouldBe orig.strings.tokenLength.max
    if (orig.strings.charPos != null) {
      c.strings.charPos should not be null
      c.strings.charPos.charset shouldBe orig.strings.charPos.charset
      orig.strings.charPos.perChar.foreach { case (ch, m) =>
        val back = c.strings.charPos.perChar(ch)
        back.count shouldBe m.count
        back.min shouldBe m.min
        back.max shouldBe m.max
        back.sum shouldBe m.sum
      }
    }
    c.hll.getEstimate shouldBe orig.hll.getEstimate
    c.freq.getNumActiveItems shouldBe orig.freq.getNumActiveItems
  }

  test("charPos tracker round trips through CharPosMessage") {
    val cfg = ProfileConfig.default.copy(withCharPos = true)
    val st = new ColumnProfileState(cfg)
    st.trackString("abc abc")
    st.trackString("zz!")
    st.strings.charPos should not be null

    val profile = ProfileProto.DatasetProfile(
      "s", 1L, None, Map.empty, Map.empty, Map("c" -> st))
    val back = ProfileProto.fromBytes(ProfileProto.toBytes(profile))
    val cp = back.columns("c").strings.charPos
    cp should not be null
    cp.charset shouldBe st.strings.charPos.charset
    cp.perChar.keySet shouldBe st.strings.charPos.perChar.keySet
    // 'a' occurs at positions 0 and 4 in "abc abc"
    cp.perChar('a').count shouldBe 2L
    cp.perChar('a').min shouldBe 0.0
    cp.perChar('a').max shouldBe 4.0
    // ' ' is outside the tracked charset -> pooled under NITL '\u0000'
    cp.perChar('\u0000').count shouldBe 1L
    // merge after parse still works
    val merged = new ColumnProfileState(cfg)
    merged.trackString("a")
    merged.merge(back.columns("c"))
    merged.strings.charPos.perChar('a').count shouldBe 3L
  }

  test("delimited stream round trip") {
    val profile = ProfileProto.DatasetProfile(
      "s", 1L, None, Map.empty, Map.empty, Map("c" -> sampleColumn()))
    val bos = new ByteArrayOutputStream()
    ProfileProto.writeDelimited(bos, profile)
    ProfileProto.writeDelimited(bos, profile)
    val in = new ByteArrayInputStream(bos.toByteArray)
    val first = ProfileProto.readDelimited(in)
    val second = ProfileProto.readDelimited(in)
    val third = ProfileProto.readDelimited(in)
    first.map(_.sessionId) shouldBe Some("s")
    second.map(_.columns.size) shouldBe Some(1)
    third shouldBe None
  }

  test("parsed column merges with a native one (cross-writer merge)") {
    val profile = ProfileProto.DatasetProfile(
      "s", 1L, None, Map.empty, Map.empty, Map("c" -> sampleColumn()))
    val parsed = ProfileProto.fromBytes(ProfileProto.toBytes(profile))
    val merged = sampleColumn()
    merged.merge(parsed.columns("c"))
    merged.count shouldBe 2 * sampleColumn().count
    merged.numbers.finalSum shouldBe 2 * sampleColumn().numbers.finalSum
  }

  test("interop: parses the reference Python implementation's profile") {
    val path = "/root/reference/core/src/test/resources/python_profile.bin"
    assume(new java.io.File(path).exists())
    val in = new FileInputStream(path)
    val profile = try ProfileProto.readDelimited(in).get finally in.close()

    profile.sessionId shouldBe "d78c144f-a15a-4fd2-b1f6-11410afb55b1"
    profile.sessionTimestamp shouldBe 1608772592814L
    profile.dataTimestamp shouldBe Some(1608768000000L)
    profile.tags should contain("Name" -> "lending_club_credit_model")

    val openAcc = profile.columns("open_acc")
    openAcc.count shouldBe 2299973L
    openAcc.schema.get(InferredType.Fractional) shouldBe 2299973L
    openAcc.numbers.variance.mean shouldBe 12.0112646 +- 1e-6
    openAcc.numbers.doubles.count shouldBe 2299973L
    openAcc.numbers.doubles.min shouldBe -97.07 +- 0.01
    openAcc.numbers.doubles.max shouldBe 202.89 +- 0.01
    openAcc.numbers.kll should not be null
    openAcc.numbers.kll.getN should be > 0L
    openAcc.hll should not be null
    openAcc.hll.getEstimate should be > 0.0

    val state = profile.columns("addr_state")
    state.count shouldBe 2299973L
    state.schema.get(InferredType.String) shouldBe 2299973L
    state.freq should not be null
    state.freq.getNumActiveItems should be > 0
  }

  test("write direction: emits every field the reference 1.3.0 reader " +
      "heapifies unconditionally, in formats it can heapify") {
    import org.apache.datasketches.kll.KllFloatsSketch
    import org.apache.datasketches.hll.HllSketch
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.CompactSketch

    // Columns chosen to exercise the empty-sketch paths: one numeric, one
    // string-only (no numeric state), one all-null (no state at all).
    val numeric = new ColumnProfileState(ProfileConfig.default)
    (1 to 50).foreach(i => numeric.trackLong(i.toLong))
    val stringy = new ColumnProfileState(ProfileConfig.default)
    stringy.trackString("a b c")
    val nullOnly = new ColumnProfileState(ProfileConfig.default)
    nullOnly.trackNull()

    for (st <- Seq(numeric, stringy, nullOnly)) {
      val fields = Wire.fields(ProfileProto.columnBytes("c", st))

      // NumbersMessage (field 4) must exist with heapify-able histogram
      // (field 4) and an UNCOMPRESSED compact theta (field 6):
      // NumberTracker.fromProtobuf:110-124 heapifies both without checks.
      val numbers = fields.find(_.number == 4)
      numbers should not be empty
      val numFields = Wire.fields(numbers.get.asBytes)
      val hist = numFields.find(_.number == 4)
      hist should not be empty
      KllFloatsSketch.heapify(Memory.wrap(hist.get.asBytes)) // must not throw
      val theta = numFields.find(_.number == 6)
      theta should not be empty
      // compact theta preamble byte 1 is the serial version; 1.3.0's
      // Sketch.heapify only accepts <= 3 (compressed v4 is rejected)
      theta.get.asBytes(1).toInt should be <= 3
      CompactSketch.heapify(Memory.wrap(theta.get.asBytes)) // must not throw

      // HllSketchMessage (field 8) must exist with heapify-able bytes:
      // ColumnProfile.fromProtobuf:229-230 heapifies unconditionally.
      val hllMsg = fields.find(_.number == 8)
      hllMsg should not be empty
      val hllBytes = Wire.fields(hllMsg.get.asBytes).find(_.number == 1)
      hllBytes should not be empty
      HllSketch.heapify(Memory.wrap(hllBytes.get.asBytes)) // must not throw

      // If StringsMessage exists: theta unconditional; length implies
      // tokenLength, each with its own heapify-able histogram + theta
      // (StringTracker.fromProtobuf:194-203).
      fields.find(_.number == 5).foreach { sMsg =>
        val sFields = Wire.fields(sMsg.asBytes)
        val sTheta = sFields.find(_.number == 4)
        sTheta should not be empty
        sTheta.get.asBytes(1).toInt should be <= 3
        CompactSketch.heapify(Memory.wrap(sTheta.get.asBytes))
        val hasLength = sFields.exists(_.number == 5)
        val hasTokenLength = sFields.exists(_.number == 6)
        hasLength shouldBe hasTokenLength
        for (nested <- sFields.filter(f => f.number == 5 || f.number == 6)) {
          val nf = Wire.fields(nested.asBytes)
          val nHist = nf.find(_.number == 4)
          nHist should not be empty
          KllFloatsSketch.heapify(Memory.wrap(nHist.get.asBytes))
          val nTheta = nf.find(_.number == 6)
          nTheta should not be empty
          CompactSketch.heapify(Memory.wrap(nTheta.get.asBytes))
        }
      }
    }
  }

  test("interop: reference profiles-1.bin legacy profile parses with " +
      "exact metrics") {
    val path = "/root/reference/core/src/test/resources/profiles-1.bin"
    assume(new java.io.File(path).exists())
    val in = new FileInputStream(path)
    val (profile, rest) =
      try (ProfileProto.readDelimited(in).get, ProfileProto.readDelimited(in))
      finally in.close()
    // the fixture is ONE delimited message (DatasetProfileTest reads it
    // with a single parse()); a second read must see clean EOF, not junk
    rest shouldBe None

    profile.sessionId shouldBe "889f8b4c-e5de-411b-ac1f-93d35ca02a1c"
    profile.sessionTimestamp shouldBe 1609910305301L
    profile.dataTimestamp shouldBe Some(1602115200000L)
    profile.tags should contain("orgId" -> "org-1")
    profile.tags should contain("Name" -> "lending_club_credit_model")
    // legacy segment tags survive, including one with a space in the key
    profile.tags should contain("whylogs.tag.city" -> "seattle")
    profile.tags should contain("whylogs.tag.housea color" -> "blue")
    profile.columns.size shouldBe 104

    val acc = profile.columns("acc_now_delinq")
    acc.count shouldBe 64969L
    acc.schema.get(InferredType.Fractional) shouldBe 64969L
    acc.numbers.variance.mean shouldBe 0.009241917081979611 +- 1e-12
    acc.numbers.doubles.count shouldBe 64969L
    acc.numbers.kll.getN should be > 0L

    // a mostly-null column: nulls ride the schema tracker, numerics only
    // count the 798 real values
    val joint = profile.columns("annual_inc_joint")
    joint.count shouldBe 64969L
    joint.schema.get(InferredType.Null) shouldBe 64171L
    joint.schema.get(InferredType.Fractional) shouldBe 798L
    joint.numbers.doubles.count shouldBe 798L
    joint.numbers.variance.mean shouldBe 90579.69018555168 +- 1e-6

    val state = profile.columns("addr_state")
    state.schema.get(InferredType.String) shouldBe 64969L
    state.freq should not be null
    state.hll.getEstimate should be > 0.0

    // the fixture's field 10 (mode profile) carries NO metrics submessage:
    // the reference's testMergeTwoLegacyProfiles expects a null model
    // after reparse. (Its presence also confirms our field-10 numbering
    // for ModelProfileMessage against a reference-written binary.)
    val in2 = new FileInputStream(path)
    val raw = try Wire.readDelimited(in2).get finally in2.close()
    Wire.fields(raw).exists(f => f.number == 10 && f.wireType == 2) shouldBe true
    ProfileProto.parseModelProfile(raw) shouldBe None
  }

  test("legacy counters.null_count folds into the NULL type count " +
      "(pre-schema-tracker writers)") {
    // mirrors ColumnProfileTest.handle_legacy_null_count:216-238: track
    // {1L, 1.0, null}, then inject counters.null_count=2 as an older
    // writer would have stored it — the reparsed column must report
    // NULL = 1 (schema-tracked) + 2 (legacy) = 3 and count = 3
    val st = new ColumnProfileState(ProfileConfig.default)
    st.trackLong(1L)
    st.trackDouble(1.0)
    st.trackNull()
    val orig = ProfileProto.columnBytes("test", st)

    val w = new Wire.Writer
    Wire.fields(orig).foreach {
      case f @ Wire.Field(2, 2, _) => // counters: copy + append null_count
        w.message(2) { c =>
          Wire.fields(f.asBytes).foreach {
            case Wire.Field(n, 0, v: Long) => c.int64(n, v)
            case g @ Wire.Field(n, 2, _)   => c.bytes(n, g.asBytes)
            case _                         =>
          }
          c.message(3)(_.int64(1, 2L)) // Int64Value{value=2}
        }
      case f @ Wire.Field(n, 2, _)   => w.bytes(n, f.asBytes)
      case Wire.Field(n, 0, v: Long) => w.int64(n, v)
      case _                         =>
    }

    val rt = ProfileProto.parseColumn(w.toByteArray)
    rt.count shouldBe 3L
    rt.schema.get(InferredType.Null) shouldBe 3L
    // the untouched original keeps the schema-tracked single null
    ProfileProto.parseColumn(orig).schema.get(InferredType.Null) shouldBe 1L
  }

  test("interop: reference regression.bin properties parse") {
    val path = "/root/reference/core/src/test/resources/regression.bin"
    assume(new java.io.File(path).exists())
    val in = new FileInputStream(path)
    val profile = try ProfileProto.readDelimited(in).get finally in.close()
    profile.sessionId shouldBe "my-model-name"
    profile.sessionTimestamp shouldBe 1615765458912L
    profile.dataTimestamp shouldBe None // wire value -1
    profile.columns.keySet should contain("predictions")
  }
}
