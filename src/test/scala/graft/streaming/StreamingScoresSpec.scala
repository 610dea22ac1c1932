package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.ops.EventStats

/** The custom-state streaming decayed score must converge to the batch
  * score (1e-9) over any batch split — including late (out-of-order)
  * events, which the exact re-anchoring update absorbs without error.
  */
class StreamingScoresSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  private def run(batches: Seq[Seq[(String, Long, Double)]],
      hl: Double): Map[String, (Double, Long, Long)] = {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    val input = MemoryStream[(String, Long, Double)]
    val stream = input.toDF().toDF("k", "t", "v")
    val out = StreamingScores.decayedScores(stream, "k", "t", "v", hl)
    val name = s"score_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // update mode: last row per key = current state; n_events is
    // monotone so max selects the final row
    spark.sql(s"""SELECT key, max_by(ewma_score, n_events),
        max(n_events), max(last_t) FROM $name GROUP BY key""")
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
  }

  private def batch(rows: Seq[(String, Long, Double)],
      hl: Double): Map[String, (Double, Long, Long)] = {
    import spark.implicits._
    EventStats.decayedScore(rows.toDF("k", "t", "v"), "k", "t", "v", hl)
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
  }

  test("streamed == batch over in-order batches") {
    val b1 = Seq(("a", 0L, 4.0), ("b", 5000000L, 7.0))
    val b2 = Seq(("a", 10000000L, 2.0), ("b", 6000000L, 1.0))
    val got = run(Seq(b1, b2), hl = 10.0)
    val want = batch(b1 ++ b2, hl = 10.0)
    got.keySet shouldBe want.keySet
    got.foreach { case (k, (s, n, t)) =>
      s shouldBe (want(k)._1 +- 1e-9)
      n shouldBe want(k)._2
      t shouldBe want(k)._3
    }
    // hand value: a = 2*2^0 + 4*2^(-1) = 4
    got("a")._1 shouldBe (4.0 +- 1e-9)
  }

  test("late events re-anchor exactly: arrival order never changes " +
    "the score") {
    val rows = (1 to 60).map(i =>
      ("k", (i * 1000000L * ((i * 7) % 13)), (i % 5).toDouble))
    val inOrder = rows.sortBy(_._2)
    val shuffled = rows.sortBy(t => (t._2 * 2654435761L) % 97)
    val a = run(Seq(inOrder.take(20), inOrder.slice(20, 40),
      inOrder.drop(40)), hl = 30.0)
    val b = run(Seq(shuffled.take(20), shuffled.slice(20, 40),
      shuffled.drop(40)), hl = 30.0)
    val want = batch(rows, hl = 30.0)
    a("k")._1 shouldBe (want("k")._1 +- 1e-9)
    b("k")._1 shouldBe (want("k")._1 +- 1e-9)
    a("k")._2 shouldBe 60L
    b("k")._3 shouldBe want("k")._3
  }

  test("NULL-valued events contribute nothing but anchor recency " +
    "(coalesced to 0 on ingest)") {
    // batch semantics: null value -> 0 contribution, still moves max_t;
    // the streaming source coalesces nulls the same way
    val rows = Seq(("a", 0L, 4.0), ("a", 10000000L, 0.0))
    val got = run(Seq(rows), hl = 10.0)
    got("a")._1 shouldBe (2.0 +- 1e-9)
    got("a")._3 shouldBe 10000000L
  }
}
