package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Stored exact-dedup screen: [[Dedup.writeFingerprintReference]] +
  * [[Dedup.filterUnseenAgainstStore]] drop rows whose normalized-text
  * fingerprint is already in the store — on batch frames AND streaming
  * frames (the anti join is stream-static, stateless), with identical
  * results.
  */
class StoredFingerprintSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  private def mkDocs(lo: Int, hi: Int): Seq[(Long, String)] =
    (lo until hi).map(i => (i.toLong, s"document body number $i"))

  private def df(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("batch screen: seen texts drop (whitespace-insensitively), " +
      "fresh texts pass with all columns intact") {
    Dedup.writeFingerprintReference(df(mkDocs(0, 30)), "text",
      "fp_ref_batch", numBuckets = 4)
    try {
      // 0-9 verbatim repeats, 10-14 formatting variants, 100+ fresh
      val variants = (10 until 15).map(i =>
        (i.toLong + 1000, s"Document   body\tnumber $i"))
      val batch = df(mkDocs(0, 10) ++ variants ++ mkDocs(100, 110))
      val kept = Dedup.filterUnseenAgainstStore(batch, "fp_ref_batch",
        "text")
      kept.columns.toSeq shouldBe Seq("doc_id", "text")
      kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq shouldBe
        (100L until 110L).toSeq
    } finally spark.sql("DROP TABLE IF EXISTS fp_ref_batch")
  }

  test("streaming screen: stream-static anti join, stateless, equals " +
      "the batch screen row-for-row") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    Dedup.writeFingerprintReference(df(mkDocs(0, 30)), "text",
      "fp_ref_stream", numBuckets = 4)
    try {
      val rows = mkDocs(20, 50) // 20-29 seen, 30-49 fresh
      val input = MemoryStream[(Long, String)]
      val screened = Dedup.filterUnseenAgainstStore(
        input.toDF().toDF("doc_id", "text"), "fp_ref_stream", "text")
      screened.isStreaming shouldBe true
      val q = screened.writeStream.format("memory")
        .queryName("fp_screen").outputMode("append").start()
      try {
        input.addData(rows.take(15))
        q.processAllAvailable()
        input.addData(rows.drop(15))
        q.processAllAvailable()
        q.lastProgress.stateOperators.length shouldBe 0
      } finally q.stop()
      val streamed = spark.table("fp_screen").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      val batch = Dedup.filterUnseenAgainstStore(df(rows),
        "fp_ref_stream", "text").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      streamed shouldBe batch
      streamed shouldBe (30L until 50L).toSeq
    } finally spark.sql("DROP TABLE IF EXISTS fp_ref_stream")
  }

  test("an empty store keeps everything; re-write replaces the store") {
    Dedup.writeFingerprintReference(df(Nil), "text", "fp_ref_rw",
      numBuckets = 2)
    try {
      val batch = df(mkDocs(0, 5))
      Dedup.filterUnseenAgainstStore(batch, "fp_ref_rw", "text")
        .count() shouldBe 5
      Dedup.writeFingerprintReference(batch, "text", "fp_ref_rw",
        numBuckets = 2)
      Dedup.filterUnseenAgainstStore(batch, "fp_ref_rw", "text")
        .count() shouldBe 0
    } finally spark.sql("DROP TABLE IF EXISTS fp_ref_rw")
  }
}
