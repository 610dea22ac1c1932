package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** The bucketed corpus store must buy shuffle-free co-located joins:
  * two tables bucketed on the same key, same bucket count, join with
  * ZERO exchanges; the unbucketed control join shuffles both sides.
  */
class CorpusStoreSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    "Exchange hashpartitioning".r.findAllIn(
      df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)).length
  }

  test("same-bucket join is exchange-free; unbucketed control shuffles") {
    import spark.implicits._
    val docs = (1 to 500).map(i => (i.toLong, s"text $i")).toDF("id", "t")
    val scores = (1 to 500).map(i => (i.toLong, i * 0.5)).toDF("id", "s")
    CorpusStore.writeBucketed(docs, "store_docs", "id", 8, Seq("id"))
    CorpusStore.writeBucketed(scores, "store_scores", "id", 8, Seq("id"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the merge-join path so the bucket partitioning is what
      // saves the exchange (a broadcast would hide it)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = CorpusStore.readBucketed(spark, "store_docs")
      val b = CorpusStore.readBucketed(spark, "store_scores")
      val joined = a.join(b, "id")
      joined.count() shouldBe 500L
      exchanges(joined) shouldBe 0
      // control: the same data joined from plain frames shuffles
      exchanges(docs.join(scores, "id")) should be > 0
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS store_docs")
      spark.sql("DROP TABLE IF EXISTS store_scores")
    }
  }

  test("bucketed round-trip preserves rows and schema") {
    import spark.implicits._
    val docs = (1 to 100).map(i => (i.toLong, s"doc $i", i % 7))
      .toDF("id", "text", "shard")
    CorpusStore.writeBucketed(docs, "store_rt", "id", 4)
    try {
      val back = CorpusStore.readBucketed(spark, "store_rt")
      back.columns.toSeq shouldBe Seq("id", "text", "shard")
      back.orderBy("id").collect().map(_.getLong(0)).toSeq shouldBe
        (1L to 100L)
    } finally spark.sql("DROP TABLE IF EXISTS store_rt")
  }

  test("overwrite is staged: old table survives a failed write, no " +
    "staging residue on success") {
    import spark.implicits._
    val v1 = (1 to 50).map(i => (i.toLong, "v1")).toDF("id", "v")
    CorpusStore.writeBucketed(v1, "store_stage", "id", 4)
    try {
      // a write that fails mid-flight (here: at analysis, duplicate
      // column names) must leave the previous table fully readable
      val broken = v1.select(col("id"), col("v"), col("v"))
      an[Exception] should be thrownBy
        CorpusStore.writeBucketed(broken, "store_stage", "id", 4)
      CorpusStore.readBucketed(spark, "store_stage").count() shouldBe 50L
      // successful overwrite swaps in the new data and leaves no
      // staging table behind
      val v2 = (1 to 80).map(i => (i.toLong, "v2")).toDF("id", "v")
      CorpusStore.writeBucketed(v2, "store_stage", "id", 4)
      val back = CorpusStore.readBucketed(spark, "store_stage")
      back.count() shouldBe 80L
      back.select("v").distinct().collect().map(_.getString(0)) shouldBe
        Array("v2")
      spark.catalog.tableExists("store_stage__staging") shouldBe false
      // the swapped-in table still carries its bucket spec
      spark.sql("DESCRIBE EXTENDED store_stage").collect()
        .map(_.mkString(" ")).mkString("\n") should include("Num Buckets")
    } finally spark.sql("DROP TABLE IF EXISTS store_stage")
  }
}
