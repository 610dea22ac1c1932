package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Embedding-distribution drift: hand-computed geometry, degenerate
  * sides, per-dim drill-down, and the single-aggregate-per-side plan
  * shape (vectors must never shuffle).
  */
class EmbeddingDriftSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  private def frame(rows: Seq[Seq[Double]]) = {
    import spark.implicits._
    rows.toDF("e")
  }

  test("identical frames: cosine 1, zero shift, equal norms") {
    val df = frame(Seq(Seq(1.0, 2.0), Seq(3.0, -1.0), Seq(0.5, 0.5)))
    val r = Drift.embeddingDrift(df, df, "e").collect().head
    r.getLong(0) shouldBe 3L
    r.getLong(1) shouldBe 3L
    r.getDouble(2) shouldBe (1.0 +- 1e-12)
    r.getDouble(3) shouldBe (0.0 +- 1e-12)
    r.getDouble(4) shouldBe (r.getDouble(5) +- 1e-12)
  }

  test("hand-computed geometry on unit vectors") {
    // cur means (0.5, 0.5); ref mean (1, 0):
    // cos = 0.5 / (sqrt(0.5) * 1), l2 shift = sqrt(0.5), norms all 1
    val cur = frame(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val ref = frame(Seq(Seq(1.0, 0.0)))
    val r = Drift.embeddingDrift(cur, ref, "e").collect().head
    r.getDouble(2) shouldBe (0.5 / math.sqrt(0.5) +- 1e-12)
    r.getDouble(3) shouldBe (math.sqrt(0.5) +- 1e-12)
    r.getDouble(4) shouldBe (1.0 +- 1e-12)
    r.getDouble(5) shouldBe (1.0 +- 1e-12)
  }

  test("empty or zero-mean side yields NULL cosine, not NaN") {
    val cur = frame(Seq(Seq(1.0, 0.0)))
    // mean of (1,0) and (-1,0) is the zero vector
    val zero = frame(Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0)))
    val r = Drift.embeddingDrift(cur, zero, "e").collect().head
    r.isNullAt(2) shouldBe true
    r.getDouble(3) shouldBe (1.0 +- 1e-12) // |(1,0) - (0,0)|
  }

  test("byDim drill-down matches per-dimension means and abs shifts") {
    val cur = frame(Seq(Seq(1.0, 4.0), Seq(3.0, 0.0))) // means (2, 2)
    val ref = frame(Seq(Seq(0.0, 5.0)))                // means (0, 5)
    val got = Drift.embeddingDriftByDim(cur, ref, "e")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    got(0) shouldBe ((0L, 2.0, 0.0, 2.0))
    got(1) shouldBe ((1L, 2.0, 5.0, 3.0))
  }

  test("plan: one aggregate per side, no vector shuffle, broadcast meet") {
    val cur = frame((1 to 100).map(i => Seq(i.toDouble, (i % 7).toDouble)))
      .repartition(8)
    val ref = frame((1 to 50).map(i => Seq((i % 5).toDouble, i.toDouble)))
      .repartition(8)
    val d = Drift.embeddingDrift(cur, ref, "e")
    d.collect()
    val plan = d.queryExecution.executedPlan.toString
    // each side reduces map-side (partial vec_sum) to one row; the only
    // exchanges are the two SinglePartition gathers of partial buffers
    plan should include ("partial_vec_sum")
    plan shouldNot include ("Exchange hashpartitioning")
    plan shouldNot include ("Exchange rangepartitioning")
  }
}
