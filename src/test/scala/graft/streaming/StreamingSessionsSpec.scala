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

  test("streaming drift monitor: per-window psi equals the batch drift") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import graft.ops.Drift
    import graft.profile.ProfileSession.ProfilingOps

    // reference window: values around 10; live stream day 2 shifts to ~40
    val day1 = Seq((ts(0), 8.0), (ts(10), 10.0), (ts(20), 12.0),
      (ts(30), 9.0), (ts(40), 11.0))
    val day2 = day1.map { case (t, v) =>
      (new Timestamp(t.getTime + 86400L * 1000), v * 4) }
    val reference = day1.toDF("ts", "value")
      .newProfilingSession().aggProfiles()
    val edges = Map("value" -> Seq(15.0, 30.0))

    val input = MemoryStream[(Timestamp, Double)]
    val profiles = StreamingProfile.windowedProfiles(
      input.toDF().toDF("ts", "value"), "ts", "1 day", "2 days")
    val drift = Drift.againstReference(profiles, reference, edges,
      keep = Seq("window"))
    val q = drift.writeStream.format("memory").queryName("drift_stream")
      .outputMode("complete").start()
    try {
      input.addData(day1); q.processAllAvailable()
      input.addData(day2); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.sql(
      "SELECT window.start, round(value_psi, 9) FROM drift_stream")
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    streamed.size shouldBe 2
    // the same-day window matches the reference -> psi 0; the shifted
    // window must alarm
    streamed.values.min shouldBe 0.0
    streamed.values.max should be > 0.25

    // batch-computed drift over the same rows gives identical numbers
    val batchProfiles = (day1 ++ day2).toDF("ts", "value")
      .newProfilingSession().withTimeColumn("ts", "1 day").aggProfiles()
    val batch = Drift.againstReference(batchProfiles, reference, edges,
        keep = Seq("window"))
      .select(col("window.start"), round(col("value_psi"), 9))
      .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    streamed shouldBe batch
  }
}
