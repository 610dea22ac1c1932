package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Stored IVF index: [[Similarity.writeIvfIndex]] persists codebook +
  * inverted lists so query batches search WITHOUT re-clustering — and
  * get exactly the in-memory [[Similarity.ivfTopK]] answers, since both
  * run the same deterministic Lloyd fit.
  */
class StoredIvfSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def embs: DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def drop(table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${table}_centroids")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_lists")
  }

  test("stored search equals the in-memory IVF path row-for-row") {
    val corpus = embs.limit(200)
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding",
      "ivf_store_eq", nCentroids = 8, iterations = 2, numBuckets = 4)
    try {
      val queries = corpus.filter(col("vec_id") < 10)
      val stored = Similarity.ivfTopKStored(queries, "ivf_store_eq",
        "vec_id", "embedding", k = 5, nProbe = 3)
        .collect().map(_.toSeq).toSet
      val direct = Similarity.ivfTopK(corpus, queries, "vec_id",
        "embedding", k = 5, nCentroids = 8, nProbe = 3, iterations = 2)
        .collect().map(_.toSeq).toSet
      stored shouldBe direct
      stored should not be empty
    } finally drop("ivf_store_eq")
  }

  test("exhaustive probe over the store equals brute force") {
    val corpus = embs.limit(150)
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding",
      "ivf_store_ex", nCentroids = 4, iterations = 1, numBuckets = 2)
    try {
      val queries = corpus.filter(col("vec_id") < 5)
      val stored = Similarity.ivfTopKStored(queries, "ivf_store_ex",
        "vec_id", "embedding", k = 8, nProbe = 4)
      val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", k = 8)
      val rec = Similarity.recallAtK(stored, exact).collect()
      rec.length shouldBe 5
      rec.foreach(_.getAs[Double]("recall") shouldBe 1.0)
    } finally drop("ivf_store_ex")
  }

  test("partial probe recall is in (0, 1]; fewer probes never add rows") {
    val corpus = embs.limit(300)
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding",
      "ivf_store_pp", nCentroids = 8, iterations = 2, numBuckets = 4)
    try {
      val queries = corpus.filter(col("vec_id") < 10)
      val narrow = Similarity.ivfTopKStored(queries, "ivf_store_pp",
        "vec_id", "embedding", k = 5, nProbe = 1)
      val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", k = 5)
      val rec = Similarity.recallAtK(narrow, exact).collect()
      rec.foreach { r =>
        r.getAs[Double]("recall") should (be > 0.0 and be <= 1.0)
      }
      narrow.groupBy("query_id").count().collect()
        .foreach(_.getLong(1) should be <= 5L)
    } finally drop("ivf_store_pp")
  }

  test("the stored corpus never exchanges: the one hash exchange is " +
      "the bounded per-query top-k aggregate") {
    val corpus = embs.limit(200)
    Similarity.writeIvfIndex(corpus, "vec_id", "embedding",
      "ivf_store_plan", nCentroids = 8, iterations = 1, numBuckets = 4)
    try {
      val res = Similarity.ivfTopKStored(
        corpus.filter(col("vec_id") < 5), "ivf_store_plan",
        "vec_id", "embedding", k = 5, nProbe = 2)
      res.collect()
      val plan = res.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
    } finally drop("ivf_store_plan")
  }

  test("indexing an empty corpus is rejected, not silently written") {
    intercept[IllegalArgumentException] {
      Similarity.writeIvfIndex(embs.filter(col("vec_id") < 0), "vec_id",
        "embedding", "ivf_store_empty", nCentroids = 4)
    }
  }
}
