package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.metrics.{ColumnProfileState, ProfileConfig}
import graft.profile.ProfileSession.ProfilingOps

/** Profile-level merge semantics pinned against the reference:
  * permissive merge intersects tags/metadata (DatasetProfile.java:251-300),
  * mergeStrict rejects mismatched identity (DatasetProfile.java:217-239),
  * and session tags ride the exported wire profiles.
  */
class ProfileMergeSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def colState(values: Range): ColumnProfileState = {
    val st = new ColumnProfileState(ProfileConfig.default)
    values.foreach(v => st.trackLong(v.toLong))
    st
  }

  private def profile(
      tags: Map[String, String],
      meta: Map[String, String] = Map.empty,
      cols: Map[String, ColumnProfileState] = Map("x" -> colState(1 to 10)))
      : ProfileProto.DatasetProfile =
    ProfileProto.DatasetProfile("sess", 1000L, Some(500L), tags, meta, cols)

  test("merge intersects tags and metadata, unions columns, sums stats") {
    val a = profile(
      tags = Map("whylogs.tag.env" -> "prod", "whylogs.tag.dc" -> "east"),
      meta = Map("run" -> "1", "host" -> "a"),
      cols = Map("x" -> colState(1 to 10), "only_a" -> colState(1 to 3)))
    val b = profile(
      tags = Map("whylogs.tag.env" -> "prod", "whylogs.tag.dc" -> "west"),
      meta = Map("run" -> "1", "host" -> "b"),
      cols = Map("x" -> colState(11 to 30), "only_b" -> colState(1 to 5)))

    val m = a.merge(b)
    // intersect-on-merge: equal entries survive, differing ones drop
    m.tags shouldBe Map("whylogs.tag.env" -> "prod")
    m.metadata shouldBe Map("run" -> "1")
    // identity comes from the left profile
    m.sessionId shouldBe "sess"
    m.sessionTimestamp shouldBe 1000L
    m.dataTimestamp shouldBe Some(500L)
    // union of columns; shared column sums
    m.columns.keySet shouldBe Set("x", "only_a", "only_b")
    m.columns("x").count shouldBe 30L
    m.columns("x").numbers.finalMin shouldBe 1.0
    m.columns("x").numbers.finalMax shouldBe 30.0
    m.columns("only_a").count shouldBe 3L
    m.columns("only_b").count shouldBe 5L
  }

  test("merge leaves its inputs untouched (no sketch aliasing)") {
    val a = profile(Map.empty, cols = Map("x" -> colState(1 to 10)))
    val b = profile(Map.empty, cols = Map("x" -> colState(1 to 10)))
    val before = a.columns("x").hll.getEstimate
    a.merge(b)
    a.merge(b) // a second merge would corrupt shared sketches if aliased
    a.columns("x").count shouldBe 10L
    a.columns("x").hll.getEstimate shouldBe before
    b.columns("x").count shouldBe 10L
  }

  test("mergeStrict accepts identical identity and rejects each mismatch") {
    val base = profile(Map("whylogs.tag.env" -> "prod"))
    val same = profile(Map("whylogs.tag.env" -> "prod"),
      cols = Map("x" -> colState(11 to 15)))
    val m = base.mergeStrict(same)
    m.columns("x").count shouldBe 15L
    m.tags shouldBe Map("whylogs.tag.env" -> "prod")

    an[IllegalArgumentException] should be thrownBy
      base.mergeStrict(same.copy(sessionId = "other"))
    an[IllegalArgumentException] should be thrownBy
      base.mergeStrict(same.copy(sessionTimestamp = 2000L))
    an[IllegalArgumentException] should be thrownBy
      base.mergeStrict(same.copy(dataTimestamp = None))
    an[IllegalArgumentException] should be thrownBy
      base.mergeStrict(same.copy(tags = Map("whylogs.tag.env" -> "dev")))
  }

  test("withTag namespaces keys under whylogs.tag.") {
    val p = profile(Map.empty).withTag("env", "prod").withMetadata("k", "v")
    p.tags shouldBe Map("whylogs.tag.env" -> "prod")
    p.metadata shouldBe Map("k" -> "v")
  }

  test("session tags and metadata ride the exported wire profile") {
    import spark.implicits._
    val exported = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
      .newProfilingSession("tagged-session")
      .withTags(Map("env" -> "prod", "model" -> "m1"))
      .withMetadata("spark", "4")
      .exportProto(sessionTimestamp = 42L)
    val bytes = exported.select("why_profile").collect().head
      .getAs[Array[Byte]](0)
    val parsed = ProfileProto.fromBytes(bytes)
    parsed.sessionId shouldBe "tagged-session"
    parsed.sessionTimestamp shouldBe 42L
    parsed.tags shouldBe Map(
      "whylogs.tag.env" -> "prod", "whylogs.tag.model" -> "m1")
    parsed.metadata shouldBe Map("spark" -> "4")
    parsed.columns("v").numbers.count shouldBe 2L
    // and the round trip through merge keeps the tags (equal on both sides)
    parsed.merge(parsed).tags shouldBe parsed.tags
  }
}
