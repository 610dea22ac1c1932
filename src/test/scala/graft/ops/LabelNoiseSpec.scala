package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** kNN label-noise screen: planted mislabels in separable clusters are
  * flagged, clean points are not, and the scoring works over any
  * neighbor frame (brute == IVF full-probe).
  */
class LabelNoiseSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  // two tight, well-separated clusters on orthogonal axes; one point
  // of each cluster carries the other cluster's label
  private def fixture = {
    import spark.implicits._
    val rows = (0 until 10).map { i =>
      val eps = 0.01f * i
      (i.toLong, Array(1.0f, eps, 0.0f), if (i == 3) 1 else 0)
    } ++ (10 until 20).map { i =>
      val eps = 0.01f * (i - 10)
      (i.toLong, Array(0.0f, eps, 1.0f), if (i == 13) 0 else 1)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("planted mislabels are the ONLY suspects; disagreement is total " +
    "inside a pure neighborhood") {
    val out = Similarity.knnLabelNoise(fixture, "vec_id", "embedding",
      "label", k = 5).collect()
    out.length shouldBe 20
    val suspects = out.filter(_.getBoolean(5)).map(_.getLong(0)).toSet
    suspects shouldBe Set(3L, 13L)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // the mislabeled point's 5 neighbors are all clean same-cluster
    // points -> every neighbor disagrees with its (wrong) label
    byId(3L).getDouble(4) shouldBe (1.0 +- 1e-12)
    byId(3L).getInt(2) shouldBe 0 // majority = the cluster's true label
    // a clean point next to the planted mislabel sees 1 dissent in 5
    byId(2L).getDouble(4) shouldBe (0.2 +- 1e-12)
    byId(2L).getBoolean(5) shouldBe false
    out.foreach(_.getLong(3) shouldBe 5L)
  }

  test("scoring is neighbor-source-agnostic: full-probe IVF neighbors " +
    "give the identical screen") {
    val df = fixture
    val brute = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 5)
    val ivf = Similarity.ivfTopK(df, df, "vec_id", "embedding", k = 5,
      nCentroids = 2, nProbe = 2)
    val a = Similarity.labelNoiseFromNeighbors(brute, df, "vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val b = Similarity.labelNoiseFromNeighbors(ivf, df, "vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    a shouldBe b
  }

  test("auto-route boundary: the IVF regime (count above threshold) " +
    "returns the identical screen to the brute-force regime") {
    val df = fixture // 20 rows
    // below threshold -> brute force; above -> ivfTopK with the default
    // exhaustive nProbe == nCentroids, so the screens must be EQUAL
    val brute = Similarity.knnLabelNoise(df, "vec_id", "embedding",
        "label", k = 5, bruteForceThreshold = 100L,
        nCentroids = 2, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val routed = Similarity.knnLabelNoise(df, "vec_id", "embedding",
        "label", k = 5, bruteForceThreshold = 5L,
        nCentroids = 2, nProbe = 2)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    routed shouldBe brute
    routed.size shouldBe 20
  }

  test("hardNegatives: ranks only different-label vectors; NULL label " +
    "differs from every label") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 0f), "A"),
      (2L, Array(0.9f, 0.1f), "A"),   // same label: never a negative
      (3L, Array(0.8f, 0.2f), "B"),
      (4L, Array(0f, 1f), "B"),
      (5L, Array(-1f, 0f), "C"))
      .toDF("vec_id", "embedding", "label")
    val negs = Similarity.hardNegatives(df, "vec_id", "embedding",
      "label", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1))
      .toMap
    // anchor 1: nearest mismatched are 3 (cos ~0.970) then 4 (0);
    // the same-label 2 (cos ~0.994) must NOT crowd them out
    negs((1L, 1)) shouldBe 3L
    negs((1L, 2)) shouldBe 4L
    // anchor 5 (label C): everything mismatches; 4 is its best
    // (cos 0) ahead of 1/3 (negative cosines, ties by id)
    negs((5L, 1)) shouldBe 4L

    val withNull = df.unionAll(Seq(
      (6L, Array(1f, 0.01f), null.asInstanceOf[String]))
      .toDF("vec_id", "embedding", "label"))
    val n2 = Similarity.hardNegatives(withNull, "vec_id", "embedding",
      "label", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1))
      .toMap
    // the NULL-labeled 6 outranks 3 for anchor 1 (cos ~0.99995)
    n2((1L, 1)) shouldBe 6L
    // and anchor 6 sees every row as a candidate: its top is 1
    n2((6L, 1)) shouldBe 1L
  }

  test("embeddingOutliers: planted outlier tops the list; constant " +
    "dims contribute zero; null vectors drop") {
    import spark.implicits._
    // dim stats over 5 rows: mean 2.4, pop-var 14.64 (both dims)
    val df = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 1f)), (4L, Array(10f, 10f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.embeddingOutliers(df, "vec_id", "embedding", 2)
      .collect()
    top.head.getLong(0) shouldBe 4L
    // (10 - 2.4)^2 / 14.64 per dim, twice
    top.head.getDouble(1) shouldBe (2 * 7.6 * 7.6 / 14.64) +- 1e-5
    top.length shouldBe 2

    // a constant third dimension changes nothing (var 0 -> contrib 0)
    val padded = df.withColumn("embedding",
      concat(col("embedding"), array(lit(5f))))
    Similarity.embeddingOutliers(padded, "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))) shouldBe
      top.map(r => (r.getLong(0), r.getDouble(1)))

    // null embeddings are excluded from stats and scoring
    val withNull = df.unionAll(Seq((9L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding"))
    Similarity.embeddingOutliers(withNull, "vec_id", "embedding", 5)
      .collect().map(_.getLong(0)) should not contain 9L
  }

  test("embeddingOutliers plan: TakeOrdered cut, no row-shuffling " +
    "sort") {
    import spark.implicits._
    val df = (0L until 50L).map(i =>
      (i, Array(i.toFloat, (i * 7 % 13).toFloat))).toDF("vec_id", "embedding")
    val q = Similarity.embeddingOutliers(df, "vec_id", "embedding", 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should include ("TakeOrderedAndProject")
  }

  test("majority tie breaks to the smallest label deterministically") {
    import spark.implicits._
    // query 0 has 4 neighbors: two labeled 5, two labeled 2 -> majority 2
    val nb = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("query_id", "item_id")
    val lbl = Seq((0L, 9), (1L, 5), (2L, 5), (3L, 2), (4L, 2))
      .toDF("vec_id", "label")
    val r = Similarity.labelNoiseFromNeighbors(nb, lbl, "vec_id", "label")
      .collect().head
    r.getInt(2) shouldBe 2
    r.getDouble(4) shouldBe (1.0 +- 1e-12)
    r.getBoolean(5) shouldBe true
  }
}
