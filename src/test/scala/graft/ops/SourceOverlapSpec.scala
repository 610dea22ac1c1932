package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Source-overlap matrix: hand-computed Jaccard between gram sets,
  * completeness (zero-overlap pairs present), and the exchange-reuse
  * plan shape.
  */
class SourceOverlapSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  test("pairwise gram Jaccard matches hand computation; zero-overlap " +
    "pairs are present") {
    import spark.implicits._
    // 2-grams: s1 {a b, b c} x2 docs (dedup to the same set),
    // s2 {a b, b d}, s3 {x y}
    val docs = Seq(
      ("s1", "a b c"), ("s1", "a b c"),
      ("s2", "a b d"), ("s3", "x y")).toDF("src", "text")
    val out = TextOps.sourceOverlap(docs, "src", "text", n = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    out.keySet shouldBe Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3"))
    out(("s1", "s2")) shouldBe ((2L, 2L, 1L, 1.0 / 3))
    out(("s1", "s3")) shouldBe ((2L, 1L, 0L, 0.0))
    out(("s2", "s3")) shouldBe ((2L, 1L, 0L, 0.0))
  }

  test("within-source duplication does not inflate overlap (distinct " +
    "gram sets); null groups drop") {
    import spark.implicits._
    val docs = Seq(
      (Some("a"), "p q r"), (Some("a"), "p q r"), (Some("a"), "p q s"),
      (Some("b"), "p q r"), (Option.empty[String], "p q r"))
      .toDF("src", "text")
    val out = TextOps.sourceOverlap(docs, "src", "text", n = 3)
      .collect()
    out.length shouldBe 1
    val r = out.head
    // a has {pqr, pqs}, b has {pqr}: inter 1, union 2
    (r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe ((2L, 1L, 1L))
    r.getDouble(5) shouldBe (0.5 +- 1e-12)
  }

  test("the deduped gram frame shuffles once: ReuseExchange collapses " +
    "the repeated occurrences after execution") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val res = TextOps.sourceOverlap(docs, "source", "text", n = 8)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the deduped gram frame feeds sizes + both join sides; subplan
    // canonicalization must reuse its exchange, not re-scan the corpus
    // (an identical persisted subplan may be cache-served instead)
    assert(plan.contains("ReusedExchange")
      || plan.contains("InMemoryTableScan"),
      "gram subplan neither exchange-reused nor cache-served:\n" + plan)
  }
}
