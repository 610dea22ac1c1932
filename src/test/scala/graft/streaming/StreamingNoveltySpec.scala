package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.ops.TextOps

/** The streaming novelty scorer must (a) give exactly the batch
  * [[TextOps.ngramNovelty]] numbers for the same documents and
  * reference, (b) run STATELESS — no state-store operators, since the
  * whole design point is a row-local projection over a broadcast gram
  * set — and (c) keep the batch form's drop-short-docs semantics.
  */
class StreamingNoveltySpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  // docs share a planted boilerplate sentence with the reference (seen
  // grams) and carry a unique tail (novel grams) -> novelty in (0, 1)
  private val boiler =
    "shared boilerplate sentence repeats verbatim across documents okay"
  private def mkDoc(i: Int): String =
    s"document $i opens with its own words u$i v$i w$i then $boiler"

  private def referenceDf = {
    import spark.implicits._
    (100 until 140).map(i => (i.toLong, mkDoc(i))).toDF("doc_id", "text")
  }

  test("streamed novelty equals batch novelty row-for-row, stateless") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val docs = (0 until 60).map(i => (i.toLong, mkDoc(i)))
    val ref = StreamingNovelty.referenceGrams(referenceDf, "text", n = 3)

    val input = MemoryStream[(Long, String)]
    val scored = StreamingNovelty.score(
      input.toDF().toDF("doc_id", "text"), ref, "doc_id", "text", n = 3)
    scored.isStreaming shouldBe true
    val q = scored.writeStream
      .format("memory").queryName("novelty_stream").outputMode("append")
      .start()
    try {
      input.addData(docs.take(30))
      q.processAllAvailable()
      input.addData(docs.drop(30))
      q.processAllAvailable()
      // stateless by design: the append-mode query holds NO state store
      // operators (a stream-static join or streaming agg would)
      val p = q.lastProgress
      p should not be null
      p.stateOperators.length shouldBe 0
    } finally q.stop()

    val streamed = spark.table("novelty_stream")
      .orderBy("doc_id").collect().toSeq
    val batch = TextOps.ngramNovelty(
      docs.toDF("doc_id", "text"), referenceDf, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect().toSeq
    streamed shouldBe batch
    streamed.size shouldBe 60
    // fixture exercises both membership branches
    val nov = streamed.map(_.getAs[Double]("novelty"))
    nov.exists(_ > 0.0) shouldBe true
    nov.exists(_ < 1.0) shouldBe true
  }

  test("documents shorter than n tokens are dropped, as in batch") {
    import spark.implicits._
    val ref = StreamingNovelty.referenceGrams(referenceDf, "text", n = 3)
    // batch frame through the same scorer (the column is engine-agnostic)
    val out = StreamingNovelty.score(
      Seq((1L, "two words"), (2L, mkDoc(2))).toDF("doc_id", "text"),
      ref, "doc_id", "text", n = 3)
    out.collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
  }
}
