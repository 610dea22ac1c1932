package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

class FunnelSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private def run(rows: Seq[(Long, Long, String, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("user_id", "t", "etype", "eid")
    Funnel.depth(df, "user_id", "t", "etype",
        Seq("view", "click", "purchase"), tieCols = Seq("eid"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1),
          (1 to 3).map(i => if (r.isNullAt(1 + i)) None
            else Some(r.getLong(1 + i))))).toMap
  }

  test("funnel depth follows strict event order, not event presence") {
    val got = run(Seq(
      // user 1: full ordered funnel
      (1L, 10L, "view", 1L), (1L, 20L, "click", 2L),
      (1L, 30L, "purchase", 3L),
      // user 2: all three types but click precedes view -> only view
      // counts; the purchase lacks an ordered click before it
      (2L, 10L, "click", 4L), (2L, 20L, "view", 5L),
      (2L, 30L, "purchase", 6L),
      // user 3: skips the middle step
      (3L, 10L, "view", 7L), (3L, 20L, "purchase", 8L),
      // user 4: never enters the funnel
      (4L, 10L, "error", 9L)))
    got(1L) shouldBe ((3, Seq(Some(10L), Some(20L), Some(30L))))
    got(2L) shouldBe ((1, Seq(Some(20L), None, None)))
    got(3L) shouldBe ((1, Seq(Some(10L), None, None)))
    got(4L) shouldBe ((0, Seq(None, None, None)))
  }

  test("step times are FIRST completions; later repeats don't move them") {
    val got = run(Seq(
      (1L, 10L, "view", 1L), (1L, 15L, "view", 2L),
      (1L, 20L, "click", 3L), (1L, 25L, "click", 4L),
      (1L, 30L, "purchase", 5L)))
    got(1L) shouldBe ((3, Seq(Some(10L), Some(20L), Some(30L))))
  }

  test("same-time events order by the tie column (strictly earlier ROW " +
    "counts)") {
    val got = run(Seq(
      (1L, 10L, "view", 1L), (1L, 10L, "click", 2L),
      // user 2: reversed tie order — the click row sorts FIRST, so no
      // earlier view exists when it arrives
      (2L, 10L, "click", 1L), (2L, 10L, "view", 2L)))
    got(1L)._1 shouldBe 2
    got(2L)._1 shouldBe 1
  }

  test("funnel is partition-invariant") {
    import spark.implicits._
    val rows = (1 to 500).map { i =>
      val t = (i * 37) % 100
      val e = Seq("view", "click", "purchase", "error")((i * 13) % 4)
      ((i % 23).toLong, t.toLong, e, i.toLong)
    }
    val df = rows.toDF("user_id", "t", "etype", "eid")
    val a = Funnel.depth(df, "user_id", "t", "etype",
        Seq("view", "click", "purchase"), Seq("eid"))
      .collect().map(_.toSeq).toSet
    val b = Funnel.depth(df.repartition(13), "user_id", "t", "etype",
        Seq("view", "click", "purchase"), Seq("eid"))
      .collect().map(_.toSeq).toSet
    a shouldBe b
  }

  test("transition matrix counts consecutive pairs with a terminal row " +
    "per user") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "view", 1L), (1L, 2L, "click", 2L), (1L, 3L, "view", 3L),
      (2L, 1L, "view", 4L), (2L, 2L, "click", 5L))
      .toDF("user_id", "t", "etype", "eid")
    val got = Funnel.transitions(ev, "user_id", "t", "etype", Seq("eid"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1))) -> r.getLong(2))
      .toMap
    got shouldBe Map(
      ("view", Some("click")) -> 2L, ("click", Some("view")) -> 1L,
      ("view", None) -> 1L, ("click", None) -> 1L)
    // outgoing counts per type sum to that type's event count
    got.collect { case ((f, _), n) if f == "view" => n }.sum shouldBe 3L
  }

  test("single-step funnel and timestamp time columns work") {
    import spark.implicits._
    val df = Seq((1L, 1700000000000000L, "view", 1L),
        (2L, 1700000000000001L, "error", 2L))
      .toDF("user_id", "us", "etype", "eid")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = Funnel.depth(df, "user_id", "ts", "etype", Seq("view"),
        Seq("eid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got(1L) shouldBe 1
    got(2L) shouldBe 0
  }
}
