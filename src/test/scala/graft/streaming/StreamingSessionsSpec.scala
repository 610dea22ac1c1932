package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.ops.Sessionize

/** The streaming session_window stats must converge to the batch
  * Sessionize stats over the same events — including sessions that only
  * merge once a LATER micro-batch delivers the bridging event.
  */
class StreamingSessionsSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def ts(sec: Int): Timestamp = new Timestamp(1700000000000L + sec * 1000L)

  // user 1: 0s, 10s | 100s..110s (gap 30s splits at 10 -> 100)
  // user 2: one event
  // batch 2 delivers 20s, which BRIDGES user 1's first session into 0..20
  private val batch1 = Seq((1L, ts(0)), (1L, ts(10)), (1L, ts(100)), (2L, ts(50)))
  private val batch2 = Seq((1L, ts(20)), (1L, ts(110)))

  test("streamed session stats equal batch sessionize on the same rows") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val input = MemoryStream[(Long, Timestamp)]
    val streamDf = input.toDF().toDF("user_id", "ts")

    val sessions = StreamingSessions.sessionStats(
      streamDf, "user_id", "ts", gap = "30 seconds")

    val q = sessions.writeStream
      .format("memory").queryName("sess_stream").outputMode("complete").start()
    try {
      input.addData(batch1)
      q.processAllAvailable()
      input.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.sql(
      """SELECT user_id, n_events, start_t, end_t, duration_t
        |FROM sess_stream""".stripMargin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    val batchDf = (batch1 ++ batch2).toDF("user_id", "ts")
    val batch = Sessionize.stats(batchDf, "user_id", "ts",
        gap = 30L * 1000000L) // micros — timestamps compare as unix_micros
      .select(col("user_id"), col("n_events"), col("start_t"), col("end_t"),
        col("duration_t"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet

    streamed shouldBe batch
    // the bridging event merged 0s/10s/20s into one 3-event session
    streamed.count(s => s._1 == 1L && s._2 == 3L) shouldBe 1
  }
}
