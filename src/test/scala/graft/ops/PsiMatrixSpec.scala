package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Pairwise PSI/JSD matrix across groups: agreement with the
  * two-cohort [[Drift.psi]] path, zero on identical distributions,
  * bounded JSD, and the one-scan plan shape.
  */
class PsiMatrixSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private val edges = Seq(10.0, 20.0, 30.0)

  private def groups(spec: (String, Seq[Double])*): DataFrame = {
    import spark.implicits._
    spec.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .toDF("g", "v")
  }

  test("identical distributions score psi 0 and jsd 0") {
    val df = groups(
      "a" -> Seq(5.0, 15.0, 25.0, 35.0),
      "b" -> Seq(5.0, 15.0, 25.0, 35.0))
    val r = Drift.psiMatrix(df, "g", "v", edges).collect()
    r.length shouldBe 1
    r(0).getAs[Double]("psi") shouldBe (0.0 +- 1e-12)
    r(0).getAs[Double]("jsd") shouldBe (0.0 +- 1e-12)
    r(0).getAs[Double]("ks") shouldBe (0.0 +- 1e-12)
  }

  test("disjoint distributions: large psi, jsd near its ln 2 bound") {
    val df = groups(
      "lo" -> Seq.fill(20)(5.0),
      "hi" -> Seq.fill(20)(35.0))
    val r = Drift.psiMatrix(df, "g", "v", edges).collect()(0)
    r.getAs[String]("group_a") shouldBe "hi" // lexicographic a < b
    r.getAs[String]("group_b") shouldBe "lo"
    r.getAs[Double]("psi") should be > 10.0
    r.getAs[Double]("jsd") shouldBe (math.log(2.0) +- 1e-4)
    r.getAs[Double]("ks") shouldBe (1.0 +- 1e-12)
  }

  test("two-group matrix equals the two-cohort psi/jsd expressions") {
    val df = groups(
      "a" -> Seq(5.0, 5.0, 15.0, 25.0, 35.0),
      "b" -> Seq(15.0, 25.0, 25.0, 35.0, 35.0))
    val viaMatrix = Drift.psiMatrix(df, "g", "v", edges).collect()(0)
    val sk = df.groupBy("g")
      .agg(graft.functions.kll_agg(col("v")).as("sk"))
    val a = sk.filter(col("g") === "a").select(col("sk").as("ska"))
    val b = sk.filter(col("g") === "b").select(col("sk").as("skb"))
    val direct = a.crossJoin(b).select(
      Drift.psi(col("ska"), col("skb"), edges).as("psi"),
      Drift.jsd(col("ska"), col("skb"), edges).as("jsd"),
      Drift.ks(col("ska"), col("skb"), edges).as("ks")).collect()(0)
    viaMatrix.getAs[Double]("psi") shouldBe direct.getDouble(0)
    viaMatrix.getAs[Double]("jsd") shouldBe direct.getDouble(1)
    viaMatrix.getAs[Double]("ks") shouldBe direct.getDouble(2)
  }

  test("K groups give K(K-1)/2 rows; the corpus aggregates once (both " +
      "join sides read the cached K-row sketch table)") {
    val df = groups((0 until 6).map(i =>
      s"g$i" -> Seq(5.0 * i, 5.0 * i + 2, 40.0 - i)): _*)
    val (m, release) = Drift.psiMatrixReleasable(df, "g", "v", edges)
    try {
      m.count() shouldBe 15
      // both sides of the pair join must read the SAME cached sketch
      // aggregate — two InMemoryRelation references, one shared cache
      // builder, so the corpus is scanned and aggregated exactly once
      val rels = m.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
      }
      rels.length shouldBe 2
      rels.map(_.cacheBuilder).distinct.length shouldBe 1
    } finally release()
  }

  test("null group rows drop; a single group yields an empty matrix") {
    import spark.implicits._
    val df = Seq(("a", 5.0), (null.asInstanceOf[String], 15.0))
      .toDF("g", "v")
    Drift.psiMatrix(df, "g", "v", edges).collect() shouldBe empty
  }
}
