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

  test("bloom reference: fixed byte footprint independent of corpus " +
    "size; novelty a lower bound, exact at a generous filter size") {
    import spark.implicits._
    val small = referenceDf.limit(5)
    val numBits = 1L << 16
    val refSmall = StreamingNovelty.referenceGramsBloom(
      small, "text", n = 3, numBits = numBits)
    val refFull = StreamingNovelty.referenceGramsBloom(
      referenceDf, "text", n = 3, numBits = numBits)
    // driver/broadcast state is the filter bytes — same size for a 5-doc
    // and a 40-doc reference (and for any 100 TB one)
    refSmall.value.length shouldBe refFull.value.length
    refFull.value.length.toLong should be <= (numBits / 8 + 64)

    val docs = (0 until 40).map(i => (i.toLong, mkDoc(i)))
      .toDF("doc_id", "text")
    val exact = StreamingNovelty.score(
      docs, StreamingNovelty.referenceGrams(referenceDf, "text", n = 3),
      "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val bloomed = StreamingNovelty.scoreBloom(
      docs, refFull, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    bloomed.keySet shouldBe exact.keySet
    // no false negatives: a gram the bloom calls novel truly is, so
    // bloom n_novel can only undercount
    bloomed.foreach { case (id, nNovel) =>
      nNovel should be <= exact(id)
    }
    // at 2^16 bits for a few thousand grams the FP rate is ~0: the
    // counts should in fact be exactly equal
    bloomed shouldBe exact
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

  test("exact build is GUARDED by the measured distinct-gram probe: " +
    "over-budget references refuse with a route pointer") {
    val e = intercept[IllegalArgumentException] {
      StreamingNovelty.referenceGrams(referenceDf, "text", n = 3,
        maxExactGrams = 5L)
    }
    e.getMessage should include("referenceGramsBloom")
  }

  test("referenceAuto routes on the probe: exact under budget, bloom " +
    "over it — scoring agrees either way at these sizes") {
    import spark.implicits._
    val probe = Seq((1L, mkDoc(1)), (2L, "a wholly novel sentence " +
      "about nothing in the reference corpus at all"))
      .toDF("doc_id", "text")

    val exactRoute = StreamingNovelty.referenceAuto(referenceDf, "text",
      n = 3, maxExactGrams = 1000000L)
    exactRoute.exact shouldBe true
    exactRoute shouldBe a[StreamingNovelty.ExactNoveltyReference]

    val bloomRoute = StreamingNovelty.referenceAuto(referenceDf, "text",
      n = 3, maxExactGrams = 5L)
    bloomRoute.exact shouldBe false
    bloomRoute shouldBe a[StreamingNovelty.BloomNoveltyReference]

    def snap(r: StreamingNovelty.NoveltyReference) =
      r.score(probe, "doc_id", "text").collect()
        .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
        .toSet
    // FP rate ~0 at 2^27 bits for a fixture-sized gram set, so the
    // bloom route's lower bound is exact here
    snap(bloomRoute) shouldBe snap(exactRoute)
  }
}
