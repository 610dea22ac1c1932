package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.profile.ProfileSession
import graft.profile.ProfileSession.ProfilingOps

/** Nested-column profiling: [[ProfileSession.flattenNested]] expands
  * struct fields to dotted leaves, arrays/maps to size + element
  * profiles (elements tracked IN-ROW by the aggregate — no explode, no
  * extra shuffle), where the reference degrades every non-primitive to
  * UNKNOWN (TypedDataConverter.java:32-60). Every expectation below is
  * hand-computed.
  */
class NestedProfileSpec extends AnyFunSuite with Matchers
    with graft.SparkSuiteBase {

  private lazy val nestedDf = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType),
        StructField("y", StringType)))),
      StructField("arr", ArrayType(DoubleType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("arr2", ArrayType(ArrayType(IntegerType))),
      StructField("as", ArrayType(StructType(Seq(
        StructField("k", StringType),
        StructField("v", LongType)))))))
    val rows = Seq(
      Row(1L, Row(1, "ab"), Seq(1.0, 2.0, null), Map("a" -> 10L, "b" -> 20L),
        Seq(Seq(1, 2), Seq(3)), Seq(Row("k1", 5L), Row("k2", 6L))),
      Row(2L, Row(3, null), null, null, Seq(Seq.empty[Int], Seq(4)),
        Seq.empty[Row]),
      Row(3L, null, Seq(5.0), Map("c" -> null), null, null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => r: Row), 2), schema)
  }

  test("struct fields flatten to dotted leaf profiles; a null struct " +
    "counts one null per leaf") {
    val p = nestedDf.newProfilingSession().flattenNested().aggProfiles()
    val r = p.select(
      col("`s.x`.count"), col("`s.x`.null_count"),
      col("`s.x`.numbers.min"), col("`s.x`.numbers.max"),
      col("`s.x`.numbers.sum"),
      col("`s.y`.count"), col("`s.y`.null_count"),
      col("`s.y`.strings.count"), col("`s.y`.strings.length.min")).head()
    r.getLong(0) shouldBe 3   // s.x: 1, 3, null(struct null)
    r.getLong(1) shouldBe 1
    r.getDouble(2) shouldBe 1.0
    r.getDouble(3) shouldBe 3.0
    r.getDouble(4) shouldBe 4.0
    r.getLong(5) shouldBe 3   // s.y: "ab", null, null
    r.getLong(6) shouldBe 2
    r.getLong(7) shouldBe 1
    r.getDouble(8) shouldBe 2.0
  }

  test("array columns profile ELEMENTS in-row (null elements -> " +
    "null_count, null array -> one null) plus a .size profile") {
    val p = nestedDf.newProfilingSession().flattenNested().aggProfiles()
    val r = p.select(
      col("arr.count"), col("arr.null_count"), col("arr.numbers.sum"),
      col("`arr.size`.count"), col("`arr.size`.null_count"),
      col("`arr.size`.numbers.min"), col("`arr.size`.numbers.max"),
      col("`arr.size`.numbers.sum")).head()
    // elements: 1.0, 2.0, null | null array | 5.0
    r.getLong(0) shouldBe 5
    r.getLong(1) shouldBe 2
    r.getDouble(2) shouldBe 8.0
    // sizes: 3, null, 1
    r.getLong(3) shouldBe 3
    r.getLong(4) shouldBe 1
    r.getDouble(5) shouldBe 1.0
    r.getDouble(6) shouldBe 3.0
    r.getDouble(7) shouldBe 4.0
  }

  test("map columns profile VALUES under the name plus .keys and " +
    ".size; nested array<array> recurses to the leaf elements") {
    val p = nestedDf.newProfilingSession().flattenNested().aggProfiles()
    val r = p.select(
      col("m.count"), col("m.null_count"), col("m.numbers.sum"),
      col("`m.keys`.strings.count"), col("`m.keys`.null_count"),
      col("`m.size`.numbers.sum"),
      col("arr2.count"), col("arr2.null_count"), col("arr2.numbers.sum"),
      col("`arr2.size`.numbers.sum")).head()
    // m values: 10, 20 | null map | null value
    r.getLong(0) shouldBe 4
    r.getLong(1) shouldBe 2
    r.getDouble(2) shouldBe 30.0
    // m keys: a, b | null map | c
    r.getLong(3) shouldBe 3
    r.getLong(4) shouldBe 1
    r.getDouble(5) shouldBe 3.0 // sizes 2, null, 1
    // arr2 leaves: 1,2,3 | 4 | null outer
    r.getLong(6) shouldBe 5
    r.getLong(7) shouldBe 1
    r.getDouble(8) shouldBe 10.0
    r.getDouble(9) shouldBe 4.0 // sizes 2, 2, null
  }

  test("array<struct> expands to per-field ELEMENT profiles plus .size") {
    val p = nestedDf.newProfilingSession().flattenNested().aggProfiles()
    val r = p.select(
      col("`as.size`.numbers.min"), col("`as.size`.numbers.max"),
      col("`as.size`.null_count"),
      col("`as.k`.strings.count"), col("`as.k`.null_count"),
      col("`as.v`.numbers.sum"), col("`as.v`.null_count")).head()
    r.getDouble(0) shouldBe 0.0 // sizes 2, 0, null
    r.getDouble(1) shouldBe 2.0
    r.getLong(2) shouldBe 1
    r.getLong(3) shouldBe 2 // k1, k2 | (empty) | null outer
    r.getLong(4) shouldBe 1
    r.getDouble(5) shouldBe 11.0 // 5 + 6
    r.getLong(6) shouldBe 1
    // ONE size profile per array<struct>, not one per field:
    // size(as.k) == size(as) for every field, so `as.k.size` /
    // `as.v.size` would be redundant copies of `as.size` (and would
    // contradict the scaladoc's "plus one element profile per FIELD")
    p.columns should contain("as.size")
    p.columns should not contain "as.k.size"
    p.columns should not contain "as.v.size"
  }

  test("flattened nested profiles MERGE like any other profile state " +
    "(two-half re-aggregation equals the direct global profile)") {
    val sess = nestedDf.newProfilingSession().flattenNested()
    val direct = sess.aggProfiles()
    val halves = sess.copy(groupKeys = Seq("id")).aggProfiles()
    val merged = ProfileSession.mergeProfiles(halves, Nil)
    val cols = Seq("`arr`.count", "`arr`.null_count", "`arr`.numbers.sum",
      "`s.x`.numbers.sum", "`m.keys`.strings.count",
      "`as.v`.numbers.sum")
    val d = direct.select(cols.map(col): _*).head()
    val m = merged.select(cols.map(col): _*).head()
    m shouldBe d
  }

  test("property: array ELEMENT profiles equal the profile of the " +
    "exploded elements on seeded random nested data (the explode-free " +
    "in-row walk is an optimization, not a semantic)") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x2E57L)
    val rows = (0 until 120).map { i =>
      val n = rnd.nextInt(6)
      val arr =
        if (rnd.nextInt(10) == 0) null
        else Seq.tabulate(n)(j =>
          if (rnd.nextInt(8) == 0) null
          else java.lang.Double.valueOf(rnd.nextInt(1000) / 7.0))
      (i.toLong, arr)
    }
    val df = rows.toDF("id", "arr")
    val nested = df.newProfilingSession().flattenNested().aggProfiles()
      .select(col("arr.count"), col("arr.null_count"),
        col("arr.numbers.count"), col("arr.numbers.sum"),
        col("arr.numbers.min"), col("arr.numbers.max"),
        col("arr.numbers.variance"), col("arr.cardinality.estimate"))
      .head()
    val exploded = df.filter(col("arr").isNotNull)
      .select(explode(col("arr")).as("el"))
      .agg(graft.functions.profile(col("el")).as("p"))
      .select(col("p.count"), col("p.null_count"),
        col("p.numbers.count"), col("p.numbers.sum"),
        col("p.numbers.min"), col("p.numbers.max"),
        col("p.numbers.variance"), col("p.cardinality.estimate"))
      .head()
    val nullArrays = rows.count(_._2 == null).toLong
    nested.getLong(0) shouldBe exploded.getLong(0) + nullArrays
    nested.getLong(1) shouldBe exploded.getLong(1) + nullArrays
    nested.getLong(2) shouldBe exploded.getLong(2)
    nested.getDouble(4) shouldBe exploded.getDouble(4) // min exact
    nested.getDouble(5) shouldBe exploded.getDouble(5) // max exact
    // sum/variance merge in different partition orders between the two
    // plans — FP addition is not associative, so compare to 1e-9 rel
    for (i <- Seq(3, 6, 7))
      nested.getDouble(i) shouldBe exploded.getDouble(i) +-
        (math.abs(exploded.getDouble(i)) * 1e-9 + 1e-12)
  }

  test("a leaf path colliding with a literal input column fails " +
    "loudly instead of producing ambiguous duplicate names") {
    import spark.implicits._
    val df = Seq((Seq(1.0), 3, 1L)).toDF("arr", "arr.size", "id")
    val e = intercept[IllegalArgumentException] {
      df.newProfilingSession().flattenNested()
    }
    e.getMessage should include ("arr.size")
  }

  test("flattened profiles ride the downstream surfaces: wire export " +
    "round-trips dotted leaf names, jsonSummary serializes them, " +
    "schemaDrift diffs them (the dotted-name resolution bug class)") {
    val sess = nestedDf.newProfilingSession().flattenNested()
    val prof = sess.aggProfiles()
    // wire export: the proto parses back and carries the dotted names
    val proto = sess.exportProto()
    val bytes = proto.select(col("why_profile")).head().getAs[Array[Byte]](0)
    val msg = graft.io.ProfileProto.fromBytes(bytes)
    msg.columns.keySet should contain allOf ("s.x", "s.y", "arr",
      "arr.size", "m.keys", "as.v")
    // json summary: dotted leaves appear as keys
    val js = graft.io.ProfileIO.jsonSummary(prof)
      .select(col("summary_json")).head().getString(0)
    js should include ("\"arr.size\"")
    js should include ("\"s.x\"")
    // schema drift between two flattened profiles resolves per leaf
    val drift = graft.ops.Drift.schemaDrift(prof, prof)
    val cols = drift.select(col("column")).collect().map(_.getString(0)).toSet
    cols should contain allOf ("s.x", "arr.size", "m.keys")
    drift.filter(col("type_changed") =!= 0).count() shouldBe 0L
  }

  test("wide nested schema: a 60-field struct flattens to 60 leaf " +
    "profiles in ONE aggregate pass") {
    import spark.implicits._
    val base = (0L until 200L).toDF("id")
    val wide = base.select(col("id"),
      struct((0 until 60).map(i => (col("id") * (i + 1)).as(s"f$i")): _*)
        .as("big"))
    val p = wide.newProfilingSession().groupBy("id").flattenNested()
    p.profiledColumns should have size 60
    val agg = wide.newProfilingSession().flattenNested().aggProfiles()
    // exactly one aggregate in the optimized plan (single-pass shape;
    // the physical tree hides behind the AQE wrapper pre-execution)
    val aggs = agg.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    aggs.size shouldBe 1
    val r = agg.select(col("`big.f0`.numbers.sum"),
      col("`big.f59`.numbers.sum")).head()
    r.getDouble(0) shouldBe (0L until 200L).sum.toDouble
    r.getDouble(1) shouldBe (0L until 200L).map(_ * 60).sum.toDouble
  }
}
