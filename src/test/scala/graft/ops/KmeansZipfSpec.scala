package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Public k-means clustering + Zipf fit: separable fixtures, exact
  * OLS hand-values, degenerate inputs.
  */
class KmeansZipfSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("kmeans separates orthogonal clusters; ids co-cluster with " +
    "their axis") {
    import spark.implicits._
    // ids alternate clusters so the deterministic first-k init seeds
    // one centroid per true cluster (even ids on the x axis, odd on z)
    val rows = (0 until 20).map { i =>
      val eps = 0.01f * (i / 2)
      if (i % 2 == 0) (i.toLong, Array(1.0f, eps, 0.0f))
      else (i.toLong, Array(0.0f, eps, 1.0f))
    }
    val df = rows.toDF("id", "e")
    val out = Similarity.kmeansClusters(df, "id", "e", k = 2,
      iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.size shouldBe 20
    val even = (0L until 20L by 2).map(out).toSet
    val odd = (1L until 20L by 2).map(out).toSet
    even.size shouldBe 1
    odd.size shouldBe 1
    even should not equal odd
  }

  test("kmeans: empty input returns an empty frame; k=1 puts " +
    "everything in cluster 0") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "e")
    Similarity.kmeansClusters(empty, "id", "e", k = 3).count() shouldBe 0
    val df = (0 until 8).map(i => (i.toLong, Array(i.toFloat, 1.0f)))
      .toDF("id", "e")
    Similarity.kmeansClusters(df, "id", "e", k = 1)
      .collect().map(_.getLong(1)).toSet shouldBe Set(0L)
  }

  test("zipfFit recovers an exact power law: counts = round(1000 / " +
    "rank) give slope ~ -1, r2 ~ 1") {
    import spark.implicits._
    // build a corpus whose token counts are EXACTLY c_r = 1000/r for
    // ranks 1..20 (token names sort with their rank on ties)
    val docs = (1 to 20).flatMap { r =>
      val cnt = 1000 / r
      Seq.fill(cnt)(f"tok$r%02d")
    }.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    val row = TextOps.zipfFit(docs, "text", topN = 20).collect().head
    row.getLong(3) shouldBe 20L
    row.getDouble(0) shouldBe (-1.0 +- 0.05) // slope (rounding of 1000/r)
    row.getDouble(2) should be > 0.999       // r2
    // intercept ~ ln(1000)
    row.getDouble(1) shouldBe (math.log(1000.0) +- 0.05)
  }

  test("zipfFit: case folding and empty-token filtering feed the " +
    "counts; fewer distinct tokens than topN is fine") {
    import spark.implicits._
    val docs = Seq("A a  a B b", "a  B").toDF("text")
    val row = TextOps.zipfFit(docs, "text", topN = 100).collect().head
    row.getLong(3) shouldBe 2L // tokens {a x4, b x3}
  }
}
