package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** k-anonymity / l-diversity screens: hand-computed verdicts, NULL
  * semantics (NULL QI combos are real groups; NULL sensitive values
  * carry no diversity), bounded violation listing, empty input.
  */
class PrivacySpec extends AnyFunSuite with Matchers with SparkSuiteBase {
  import spark.implicits._

  // (zip, age, disease): zip-age is the QI pair
  private def fixture = Seq(
    ("10a", 30, "flu"), ("10a", 30, "flu"), ("10a", 30, "cold"),
    ("10b", 40, "flu"), ("10b", 40, "flu"),
    ("10c", 50, "cancer")) // the singleton group
    .toDF("zip", "age", "disease")

  test("k-anonymity: hand-computed report and violation listing") {
    val r = Privacy.kAnonymityReport(fixture, Seq("zip", "age"), k = 2)
      .collect().head
    r.getLong(0) shouldBe 6L  // n_rows
    r.getLong(1) shouldBe 3L  // n_groups
    r.getLong(2) shouldBe 1L  // min_group_size
    r.getLong(3) shouldBe 1L  // n_violating_groups
    r.getLong(4) shouldBe 1L  // n_rows_at_risk
    r.getBoolean(5) shouldBe false
    Privacy.kAnonymityReport(fixture, Seq("zip", "age"), k = 1)
      .collect().head.getBoolean(5) shouldBe true

    val v = Privacy.kAnonymityViolations(fixture, Seq("zip", "age"), 3)
      .collect().map(r0 => (r0.getString(0), r0.getInt(1), r0.getLong(2)))
    // size-ascending: the singleton leads, then the pair
    v shouldBe Array(("10c", 50, 1L), ("10b", 40, 2L))
    Privacy.kAnonymityViolations(fixture, Seq("zip", "age"), 3,
      maxGroups = 1).collect().length shouldBe 1
  }

  test("l-diversity: distinct sensitive values per group; NULLs add " +
    "no diversity") {
    val r = Privacy.lDiversityReport(fixture, Seq("zip", "age"),
      "disease", l = 2).collect().head
    r.getLong(0) shouldBe 3L  // n_groups
    r.getLong(1) shouldBe 1L  // min distinct (10b: only flu)
    r.getLong(2) shouldBe 2L  // 10b and 10c violate
    r.getLong(3) shouldBe 3L  // 2 + 1 rows at risk
    r.getBoolean(4) shouldBe false

    // a group whose sensitive values are all NULL has diversity 0
    val withNull = fixture.unionAll(
      Seq(("10d", 60, null.asInstanceOf[String]),
        ("10d", 60, null.asInstanceOf[String])).toDF("zip", "age", "disease"))
    val r2 = Privacy.lDiversityReport(withNull, Seq("zip", "age"),
      "disease", l = 1).collect().head
    r2.getLong(1) shouldBe 0L
    r2.getBoolean(4) shouldBe false
  }

  test("t-closeness: hand-computed TVD per group; absent values " +
    "contribute their global share") {
    // global: flu 4/6, cold 1/6, cancer 1/6
    // 10a {flu 2/3, cold 1/3}: (0 + 1/6 + absent cancer 1/6)/2 = 1/6
    // 10b {flu 1}:             (1/3 + absent 1/3)/2          = 1/3
    // 10c {cancer 1}:          (5/6 + absent 5/6)/2          = 5/6
    val r = Privacy.tClosenessReport(fixture, Seq("zip", "age"),
      "disease", t = 0.3).collect().head
    r.getLong(0) shouldBe 6L           // n_rows
    r.getLong(1) shouldBe 3L           // n_groups
    r.getDouble(2) shouldBe 0.833333 +- 1e-9  // max_tvd = 5/6
    r.getLong(3) shouldBe 2L           // 10b (1/3) and 10c (5/6) > 0.3
    r.getLong(4) shouldBe 3L           // 2 + 1 rows at risk
    r.getBoolean(5) shouldBe false
    Privacy.tClosenessReport(fixture, Seq("zip", "age"), "disease",
      t = 0.9).collect().head.getBoolean(5) shouldBe true
  }

  test("t-closeness: NULL sensitive values are a real category") {
    val withNull = fixture.unionAll(
      Seq(("10d", 60, null.asInstanceOf[String]),
        ("10d", 60, null.asInstanceOf[String]))
        .toDF("zip", "age", "disease"))
    // global over 8 rows: flu 1/2, cold 1/8, cancer 1/8, NULL 1/4
    // 10d {NULL 1}: (|1 - 1/4| + (1 - 1/4))/2 = 3/4
    val per = Privacy.tClosenessReport(withNull, Seq("zip", "age"),
      "disease", t = 0.7).collect().head
    per.getLong(1) shouldBe 4L
    // violators at t=0.7: 10c (tvd (7/8+7/8)/2=7/8) and 10d (3/4)
    per.getLong(3) shouldBe 2L
  }

  test("t-closeness: empty input is vacuously close") {
    val r = Privacy.tClosenessReport(fixture.filter(lit(false)),
      Seq("zip"), "disease", t = 0.2).collect().head
    r.getLong(0) shouldBe 0L
    r.getDouble(2) shouldBe 0.0
    r.getBoolean(5) shouldBe true
  }

  test("NULL quasi-identifier combinations form real groups") {
    val df = Seq((Some("10a"), 1), (None, 2), (None, 3))
      .map { case (z, i) => (z.orNull, i) }.toDF("zip", "v")
      .withColumn("age", lit(30))
    val r = Privacy.kAnonymityReport(df, Seq("zip", "age"), k = 2)
      .collect().head
    r.getLong(1) shouldBe 2L  // (10a, 30) and (NULL, 30)
    r.getLong(3) shouldBe 1L  // the 10a singleton violates
  }

  test("empty input: zero rows, vacuously anonymous") {
    val empty = fixture.filter(lit(false))
    val r = Privacy.kAnonymityReport(empty, Seq("zip"), k = 5)
      .collect().head
    r.getLong(0) shouldBe 0L
    r.getLong(1) shouldBe 0L
    r.getBoolean(5) shouldBe true
  }

  test("plan: one map-side-combined exchange, no global sort in the " +
    "bounded violations listing") {
    val rep = Privacy.kAnonymityReport(
      spark.read.parquet(s"$sfDir/orders.parquet"),
      Seq("o_orderstatus", "o_custkey"), k = 5)
    rep.collect()
    val plan = rep.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should include ("partial_count")
    val v = Privacy.kAnonymityViolations(
      spark.read.parquet(s"$sfDir/orders.parquet"),
      Seq("o_orderstatus", "o_custkey"), k = 5)
    v.collect()
    v.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) should include ("TakeOrderedAndProject")
  }
}
