package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.ops.Funnel

/** The custom-state streaming funnel must converge to the batch funnel
  * over a time-ordered replay — including funnels completed only ACROSS
  * micro-batches (the state carries step times between triggers).
  */
class StreamingFunnelSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  private val steps = Seq("view", "click", "purchase")

  test("streamed funnel equals batch funnel; state extends across " +
    "batches") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    // user 1 completes the funnel only once batch 2 delivers the
    // purchase; user 2's click precedes its view; user 3 no funnel
    val batch1 = Seq((1L, 10L, "view", 1L), (1L, 20L, "click", 2L),
      (2L, 10L, "click", 3L), (3L, 5L, "error", 4L))
    val batch2 = Seq((1L, 30L, "purchase", 5L), (2L, 20L, "view", 6L),
      (2L, 30L, "purchase", 7L))

    val input = MemoryStream[(Long, Long, String, Long)]
    val stream = input.toDF().toDF("user_id", "t", "etype", "eid")
    val out = StreamingFunnel.depth(stream, "user_id", "t", "etype",
      steps, "eid")
    val q = out.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    // update mode: the LAST row per user is the current funnel — take
    // max depth (monotone) and max step times (-1 only until set)
    val streamed = spark.sql(
      """SELECT user, max(depth), max(t_step1), max(t_step2),
        |  max(t_step3)
        |FROM funnel_stream GROUP BY user""".stripMargin)
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val batch = Funnel.depth((batch1 ++ batch2)
        .toDF("user_id", "t", "etype", "eid"),
        "user_id", "t", "etype", steps, Seq("eid"))
      .select(col("user_id").cast("string"), col("depth"),
        coalesce(col("t_step1"), lit(-1L)),
        coalesce(col("t_step2"), lit(-1L)),
        coalesce(col("t_step3"), lit(-1L)))
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    streamed shouldBe batch
    streamed("1") shouldBe ((3, 10L, 20L, 30L)) // completed across batches
    // user 2's click precedes its view, so the purchase has no ordered
    // click chain — depth stops at the view
    streamed("2")._1 shouldBe 1
    streamed("3")._1 shouldBe 0
  }

  test("an out-of-order event cannot corrupt already-reached steps") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    val input = MemoryStream[(Long, Long, String, Long)]
    val out = StreamingFunnel.depth(
      input.toDF().toDF("user_id", "t", "etype", "eid"),
      "user_id", "t", "etype", steps, "eid")
    val q = out.writeStream.format("memory").queryName("funnel_ooo")
      .outputMode("update").start()
    try {
      input.addData(Seq((1L, 100L, "view", 1L), (1L, 200L, "click", 2L)))
      q.processAllAvailable()
      // a LATE click earlier than the recorded view must not fire
      // purchase chains or move the recorded click time
      input.addData(Seq((1L, 50L, "click", 3L), (1L, 250L, "purchase", 4L)))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.sql(
      """SELECT max(depth), max(t_step2) FROM funnel_ooo
        |WHERE user = '1'""".stripMargin).head
    last.getInt(0) shouldBe 3
    last.getLong(1) shouldBe 200L // first ORDERED click, not the late one
  }
}
