package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Kaplan–Meier survival: hand-computed curve on a classic fixture,
  * censoring semantics, the everyone-dies zero tail, and the
  * time-to-event extraction feeding it.
  */
class SurvivalSpec extends AnyFunSuite with Matchers with SparkSuiteBase {
  import spark.implicits._

  test("hand-computed curve: factors, risk sets, and censoring at an " +
      "event time") {
    // (duration, observed): events at 6 (x2), 7, 13; censored at 6,
    // 10, 16. Censored-at-6 is still AT RISK at 6 (standard KM).
    val df = Seq((6L, 1), (6L, 1), (6L, 0), (7L, 1), (10L, 0),
      (13L, 1), (16L, 0)).toDF("duration", "observed")
    val got = EventStats.kaplanMeier(df, "duration", "observed")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    got.map(x => (x._1, x._2, x._3, x._4)) shouldBe Array(
      (6L, 7L, 2L, 1L), (7L, 4L, 1L, 0L), (13L, 2L, 1L, 0L))
    got(0)._5 shouldBe (5.0 / 7.0 +- 1e-12)
    got(1)._5 shouldBe (5.0 / 7.0 * 3.0 / 4.0 +- 1e-12)
    got(2)._5 shouldBe (5.0 / 7.0 * 3.0 / 4.0 * 0.5 +- 1e-12)
    // hazard + Nelson-Aalen + Greenwood band off the same rows
    val hz = EventStats.kaplanMeier(df, "duration", "observed")
      .orderBy("t").collect()
      .map(r => (r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8)))
    hz(0)._1 shouldBe (2.0 / 7.0 +- 1e-12)
    hz(1)._2 shouldBe (2.0 / 7.0 + 1.0 / 4.0 +- 1e-12)
    hz(2)._2 shouldBe (2.0 / 7.0 + 1.0 / 4.0 + 0.5 +- 1e-12)
    // Greenwood at t=6: se = S * sqrt(d/(n(n-d))) = 5/7 * sqrt(2/35)
    val s6 = 5.0 / 7.0
    val se6 = s6 * math.sqrt(2.0 / 35.0)
    hz(0)._3 shouldBe (math.max(s6 - 1.96 * se6, 0.0) +- 1e-12)
    hz(0)._4 shouldBe (math.min(s6 + 1.96 * se6, 1.0) +- 1e-12)
    // bands bracket the estimate and stay in [0, 1]
    hz.foreach { v =>
      v._3 should be >= 0.0
      v._4 should be <= 1.0
    }
  }

  test("when everyone at risk has the event, survival pins to 0 " +
      "(Spark's log(0)-is-NULL cannot poison the product)") {
    val df = Seq((1L, 1), (3L, 1), (3L, 1)).toDF("duration", "observed")
    val got = EventStats.kaplanMeier(df, "duration", "observed")
      .orderBy("t").collect()
    got.map(_.getLong(0)).toSeq shouldBe Seq(1L, 3L)
    got(0).getDouble(4) shouldBe (2.0 / 3.0 +- 1e-12)
    got(1).getDouble(4) shouldBe 0.0
  }

  test("all-censored input yields an empty curve; negative and null " +
      "durations drop") {
    val df = Seq((5L, 0), (9L, 0)).toDF("duration", "observed")
    EventStats.kaplanMeier(df, "duration", "observed")
      .collect() shouldBe empty
    val bad = Seq((-1L, 1), (4L, 1)).toDF("duration", "observed")
    EventStats.kaplanMeier(bad, "duration", "observed")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(4L)
  }

  test("grouped curves equal per-group separate calls, and the windows " +
      "partition on the group (no global sort)") {
    val df = Seq(("x", 6L, 1), ("x", 6L, 1), ("x", 6L, 0), ("x", 7L, 1),
      ("y", 2L, 1), ("y", 5L, 0), ("y", 9L, 1))
      .toDF("g", "duration", "observed")
    val grouped = EventStats.kaplanMeierGrouped(df, "duration",
      "observed", "g")
    val viaGroup = grouped.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5)).toMap
    for (g <- Seq("x", "y")) {
      val solo = EventStats.kaplanMeier(df.filter(col("g") === g),
        "duration", "observed")
        .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
      solo.foreach { case (t, s) =>
        viaGroup((g, t)) shouldBe (s +- 1e-12)
      }
    }
    // windows partition on the group: the window exchange hashes on
    // it instead of funnelling everything to one partition
    val plan = grouped.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    plan should include ("Exchange hashpartitioning(group")
    plan shouldNot include ("Exchange SinglePartition")
  }

  test("logRank: hand-computed observed/expected/variance on a 4-subject " +
      "fixture") {
    // A: events at 1, 3; B: event at 2, censored at 4.
    // t=1: n=(2,2) d1=1 -> E1=1/2,  V=1/4
    // t=2: n=(1,2) d2=1 -> E1=1/3,  V=2/9
    // t=3: n=(1,1) d1=1 -> E1=1/2,  V=1/4
    // O1=2, E1=4/3, V=13/18, chi2=(2/3)^2/(13/18)=8/13
    val df = Seq(("A", 1L, 1), ("A", 3L, 1), ("B", 2L, 1), ("B", 4L, 0))
      .toDF("g", "duration", "observed")
    val r = EventStats.logRank(df, "duration", "observed", "g")
      .collect()(0)
    r.getString(0) shouldBe "A"
    r.getString(1) shouldBe "B"
    r.getLong(2) shouldBe 2L
    r.getLong(3) shouldBe 2L
    r.getLong(4) shouldBe 2L // observed_a
    r.getDouble(5) shouldBe (4.0 / 3.0 +- 1e-12)
    r.getDouble(6) shouldBe (8.0 / 13.0 +- 1e-12)
  }

  test("logRank: identical cohorts score chi2 exactly 0; fully " +
      "separated cohorts score large") {
    val same = Seq(("A", 2L, 1), ("A", 5L, 1), ("B", 2L, 1),
      ("B", 5L, 1)).toDF("g", "duration", "observed")
    EventStats.logRank(same, "duration", "observed", "g")
      .collect()(0).getDouble(6) shouldBe (0.0 +- 1e-12)
    val sep = (1 to 10).map(i => ("A", i.toLong, 1)) ++
      (1 to 10).map(i => ("B", 100L + i, 1))
    EventStats.logRank(sep.toDF("g", "duration", "observed"),
      "duration", "observed", "g")
      .collect()(0).getDouble(6) should be > 10.0
  }

  test("timeToEvent: duration to first target, censored at last event " +
      "when the target never comes") {
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(100), "view"), (1L, ts(200), "purchase"),
      (1L, ts(300), "view"),
      (2L, ts(100), "view"), (2L, ts(250), "view"),
      (3L, ts(500), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventStats.timeToEvent(ev, "user_id", "ts", "event_type",
      "purchase")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2)))
      .toMap
    got(1L) shouldBe ((100000000L, 1)) // 100s in micros
    got(2L) shouldBe ((150000000L, 0)) // censored at last view
    got(3L) shouldBe ((0L, 1))         // target is the first event
  }
}
