package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Association statistics: hand-computed Pearson/MI/chi-squared on tiny
  * frames, degenerate inputs, and the one-scan plan shape.
  */
class StatsSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("corrMatrix matches hand-computed Pearson and covariance") {
    import spark.implicits._
    // y = 2x exactly -> corr 1; z anti-correlates with x -> corr -1
    val df = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0))
      .toDF("x", "y", "z")
    val got = Stats.corrMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    got.keySet shouldBe Set(("x", "y"), ("x", "z"), ("y", "z"))
    got(("x", "y"))._1 shouldBe (1.0 +- 1e-12)
    got(("x", "z"))._1 shouldBe (-1.0 +- 1e-12)
    // covar_samp(x, y) = sum((x-2)(y-4))/2 = (2 + 0 + 2)/2 = 2
    got(("x", "y"))._2 shouldBe (2.0 +- 1e-12)
    got(("x", "y"))._3 shouldBe 3L
  }

  test("corrMatrix: NULLs excluded pairwise; n counts surviving pairs") {
    import spark.implicits._
    val df = Seq((Some(1.0), Some(1.0), Option.empty[Double]),
      (Some(2.0), Some(3.0), Some(1.0)),
      (Some(3.0), Some(5.0), Some(2.0)),
      (Some(4.0), Option.empty[Double], Some(3.0)))
      .toDF("a", "b", "c")
    val got = Stats.corrMatrix(df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(4))).toMap
    got(("a", "b"))._2 shouldBe 3L // the (4, NULL) row dropped
    got(("a", "c"))._2 shouldBe 3L
    got(("b", "c"))._2 shouldBe 2L
    got(("a", "b"))._1 shouldBe (1.0 +- 1e-12) // b = 2a - 1 where present
  }

  test("corrMatrix is a single aggregation job: no shuffle of input rows") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plan = Stats.corrMatrix(df, Seq("l_quantity", "l_extendedprice"))
      .queryExecution.executedPlan.toString
    // partial + final aggregate: the ONLY exchange carries moment
    // buffers to one partition — input rows never shuffle
    plan.split("Exchange").length - 1 shouldBe 1
  }

  test("categoricalAssociation: independence gives mi=0 chi2=0; " +
    "perfect association saturates Cramer's V") {
    import spark.implicits._
    // independent 2x2 uniform grid
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    val r1 = Stats.categoricalAssociation(ind, "u", "v").collect().head
    r1.getDouble(0) shouldBe (0.0 +- 1e-12) // mi
    r1.getDouble(1) shouldBe (0.0 +- 1e-9)  // chi2
    r1.getDouble(2) shouldBe (0.0 +- 1e-9)  // cramers_v
    // perfect: u determines v -> mi = ln(2), V = 1
    val per = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("u", "v")
    val r2 = Stats.categoricalAssociation(per, "u", "v").collect().head
    r2.getDouble(0) shouldBe (math.log(2.0) +- 1e-12)
    r2.getDouble(2) shouldBe (1.0 +- 1e-12)
    r2.getLong(3) shouldBe 4L
    r2.getLong(4) shouldBe 2L
  }

  test("featureRelevance: one row per feature, equal to the per-pair " +
    "association, ranked signal ordering") {
    import spark.implicits._
    // f1 determines the label perfectly; f2 is independent of it
    val df = Seq(
      ("a", "p", "x"), ("a", "q", "x"), ("b", "p", "y"), ("b", "q", "y"))
      .toDF("f1", "f2", "label")
    val r = Stats.featureRelevance(df, Seq("f1", "f2"), "label")
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(3))).toMap
    r.keySet shouldBe Set("f1", "f2")
    r("f1")._1 shouldBe (math.log(2.0) +- 1e-12) // mi saturates
    r("f1")._2 shouldBe (1.0 +- 1e-12)           // V = 1
    r("f2")._1 shouldBe (0.0 +- 1e-12)
    // each row equals the direct per-pair call
    val direct = Stats.categoricalAssociation(df, "f1", "label")
      .collect().head
    val viaRel = Stats.featureRelevance(df, Seq("f1"), "label")
      .collect().head
    viaRel.getDouble(1) shouldBe direct.getDouble(0)
    viaRel.getDouble(2) shouldBe direct.getDouble(1)
    viaRel.getLong(4) shouldBe direct.getLong(3)
  }

  test("categoricalAssociation: chi2 counts unobserved cells via the " +
    "n - sum(e) identity; NULLs drop pairwise") {
    import spark.implicits._
    // 2x2 with an EMPTY (b, x) cell: counts a/x=2, a/y=1, b/y=1
    // e(a,x)=1.5 e(a,y)=1.5 e(b,x)=0.5 e(b,y)=0.5
    // chi2 = 0.25/1.5 + 0.25/1.5 + 0.5 + 0.25/0.5 = 4/3
    val df = Seq(Some("a") -> Some("x"), Some("a") -> Some("x"),
      Some("a") -> Some("y"), Some("b") -> Some("y"),
      Option.empty[String] -> Some("x"), Some("a") -> Option.empty[String])
      .toDF("u", "v")
    val r = Stats.categoricalAssociation(df, "u", "v").collect().head
    r.getDouble(1) shouldBe (4.0 / 3.0 +- 1e-12)
    r.getLong(3) shouldBe 4L
  }

  test("categoricalAssociation: single-category side yields NULL " +
    "Cramer's V, zero mi") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "y")).toDF("u", "v")
    val r = Stats.categoricalAssociation(df, "u", "v").collect().head
    r.getDouble(0) shouldBe (0.0 +- 1e-12)
    r.isNullAt(2) shouldBe true
  }
}
