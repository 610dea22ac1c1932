package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Time-decayed event scores: hand-computed decay, null handling,
  * replay stability, and the one-shuffle plan shape.
  */
class EventStatsSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  test("decayed score matches the closed form; anchored at the key's " +
    "last event") {
    import spark.implicits._
    // key a: values 4 @ t=0s, 2 @ t=10s (micros), half-life 10s:
    // score = 2 * 2^0 + 4 * 2^(-1) = 4; key b: single event -> its value
    val df = Seq(("a", 0L, 4.0), ("a", 10000000L, 2.0),
      ("b", 5000000L, 7.0)).toDF("k", "t", "v")
    val got = EventStats.decayedScore(df, "k", "t", "v", 10.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    got("a")._1 shouldBe (4.0 +- 1e-12)
    got("a")._2 shouldBe 2L
    got("a")._3 shouldBe 10000000L
    got("b")._1 shouldBe (7.0 +- 1e-12)
  }

  test("NULL values contribute nothing but still anchor recency") {
    import spark.implicits._
    val df = Seq(("a", Some(4.0), 0L), ("a", Option.empty[Double], 10000000L))
      .toDF("k", "v", "t")
    val r = EventStats.decayedScore(df, "k", "t", "v", 10.0)
      .collect().head
    // the null event moved max_t to 10s, halving the first value
    r.getDouble(1) shouldBe (2.0 +- 1e-12)
    r.getLong(3) shouldBe 10000000L
  }

  test("replay-stable: same events, any partitioning, same score") {
    import spark.implicits._
    def frame(n: Int) = (1 to 300)
      .map(i => ((i % 7).toString, i.toLong * 1000000L, (i % 13).toDouble))
      .toDF("k", "t", "v").repartition(n)
    val a = EventStats.decayedScore(frame(1), "k", "t", "v", 60.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = EventStats.decayedScore(frame(32), "k", "t", "v", 60.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    a.keySet shouldBe b.keySet
    a.foreach { case (k, v) => v shouldBe (b(k) +- 1e-9) }
  }

  test("decayedCount weighs every event at 1 with the same decay") {
    import spark.implicits._
    val df = Seq(("a", 0L, 99.0), ("a", 10000000L, -5.0)).toDF("k", "t", "v")
    EventStats.decayedCount(df, "k", "t", 10.0)
      .collect().head.getDouble(1) shouldBe (1.5 +- 1e-12)
  }

  test("plan: the window pass and the aggregate share ONE exchange") {
    import spark.implicits._
    val df = (1 to 1000)
      .map(i => ((i % 50).toString, i.toLong * 1000L, 1.0))
      .toDF("k", "t", "v").repartition(8)
    val scored = EventStats.decayedScore(df, "k", "t", "v", 60.0)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
    plan shouldNot include ("Exchange rangepartitioning")
  }
}
