package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.ops.Funnel

/** The custom-state streaming transition matrix must converge to the
  * batch operator's non-terminal rows over a time-ordered replay —
  * including transitions whose two events arrive in DIFFERENT
  * micro-batches (the carried last-event state stitches them).
  */
class StreamingTransitionsSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  test("streamed matrix equals batch non-terminal transitions; " +
    "cross-batch pairs count") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    // user 1's view->click straddles the batch boundary; user 2 has a
    // repeated self-transition; user 3 contributes nothing (one event)
    val batch1 = Seq((1L, 10L, "view", 1L), (2L, 10L, "view", 2L),
      (2L, 20L, "view", 3L), (3L, 5L, "error", 4L))
    val batch2 = Seq((1L, 30L, "click", 5L), (2L, 30L, "view", 6L),
      (2L, 40L, "purchase", 7L))

    val input = MemoryStream[(Long, Long, String, Long)]
    val out = StreamingTransitions.matrix(
      input.toDF().toDF("user_id", "t", "etype", "eid"),
      "user_id", "t", "etype", "eid")
    val q = out.writeStream.format("memory").queryName("trans_stream")
      .outputMode("update").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamingTransitions
      .collapse(spark.table("trans_stream"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap

    val batch = Funnel.transitions(
      (batch1 ++ batch2).toDF("user_id", "t", "etype", "eid"),
      "user_id", "t", "etype", Seq("eid"))
      .filter(col("to_type").isNotNull)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getLong(2)).toMap

    streamed shouldBe batch
    streamed(("view", "click")) shouldBe 1L // stitched across batches
    streamed(("view", "view")) shouldBe 2L
    streamed(("view", "purchase")) shouldBe 1L
  }

  test("counts are cumulative and monotone across triggers") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    val input = MemoryStream[(Long, Long, String, Long)]
    val out = StreamingTransitions.matrix(
      input.toDF().toDF("user_id", "t", "etype", "eid"),
      "user_id", "t", "etype", "eid")
    val q = out.writeStream.format("memory").queryName("trans_mono")
      .outputMode("update").start()
    try {
      input.addData(Seq((1L, 10L, "a", 1L), (1L, 20L, "b", 2L)))
      q.processAllAvailable()
      input.addData(Seq((1L, 30L, "a", 3L), (1L, 40L, "b", 4L)))
      q.processAllAvailable()
    } finally q.stop()
    // the (a, b) count is emitted once per trigger, strictly growing
    val ns = spark.table("trans_mono")
      .filter(col("from_type") === "a" && col("to_type") === "b")
      .select(col("n")).collect().map(_.getLong(0)).sorted
    ns shouldBe Array(1L, 2L)
  }
}
