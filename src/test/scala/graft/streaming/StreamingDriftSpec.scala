package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.ops.Drift
import graft.profile.ProfileSession.ProfilingOps

/** The streaming drift monitor must score windows exactly as the batch
  * path does (same sketches -> same PSI), and the alert filter must pass
  * only drifted windows.
  */
class StreamingDriftSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  // day 1 matches the reference distribution exactly (same i % 50
  // empirical shape); day 2 is shifted far right of every bin edge
  private val day1 = (1 to 200).map(i => (ts(1, i % 20 + 1), i % 50 + 0.0))
  private val day2 = (1 to 200).map(i => (ts(2, i % 20 + 1), i % 50 + 500.0))
  private val edges = Map("value" -> Seq(10.0, 25.0, 40.0, 100.0))

  private def reference = {
    import spark.implicits._
    (1 to 200).map(i => i % 50 + 0.0).toDF("value")
      .newProfilingSession().aggProfiles()
  }

  test("streamed per-window drift equals batch per-window drift") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val ref = reference
    val input = MemoryStream[(Timestamp, Double)]
    val streamDf = input.toDF().toDF("ts", "value")

    val scored = StreamingDrift.monitor(
      streamDf, "ts", "1 day", "2 days", ref, edges)
    val q = scored.writeStream
      .format("memory").queryName("drift_stream").outputMode("complete")
      .start()
    try {
      input.addData(day1)
      q.processAllAvailable()
      input.addData(day2)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.sql(
      "SELECT CAST(window.start AS DATE) AS day, value_psi FROM drift_stream")
      .collect().map(r => r.getDate(0).toString -> r.getDouble(1)).toMap

    val batchProfiles = (day1 ++ day2).toDF("ts", "value")
      .newProfilingSession().withTimeColumn("ts", "1 day").aggProfiles()
    val expected = Drift.againstReference(batchProfiles, ref, edges,
        keep = Seq("window"))
      .select(col("window.start").cast("date").cast("string"), col("value_psi"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    streamed.keySet shouldBe expected.keySet
    streamed.size shouldBe 2
    for ((day, psi) <- expected)
      streamed(day) shouldBe psi +- 1e-12
    // and the semantics: the matching day barely drifts, the shifted day does
    streamed("2024-01-01") should be < 0.5
    streamed("2024-01-02") should be > 2.0
  }

  test("alerts emit only windows beyond the PSI threshold") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx

    val ref = reference
    val input = MemoryStream[(Timestamp, Double)]
    val streamDf = input.toDF().toDF("ts", "value")

    val alerts = StreamingDrift.alerts(
      streamDf, "ts", "1 day", "2 days", ref, edges, threshold = 1.0)
    val q = alerts.writeStream
      .format("memory").queryName("drift_alerts").outputMode("complete")
      .start()
    try {
      input.addData(day1 ++ day2)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.sql(
      "SELECT CAST(window.start AS DATE) AS day FROM drift_alerts")
      .collect().map(_.getDate(0).toString).toSeq
    got shouldBe Seq("2024-01-02")
  }
}
