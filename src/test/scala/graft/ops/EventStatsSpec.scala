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

  test("rollingWindowStats: exact trailing-window counts/sums, ties " +
    "see the full tied set, NULL values count but sum 0") {
    import spark.implicits._
    val df = Seq(
      ("a", 0L, Some(1.0)), ("a", 5000000L, Some(2.0)),
      ("a", 12000000L, Some(4.0)),          // 5s window drops t=0
      ("a", 12000000L, Option.empty[Double]), // tie: sees its twin
      ("b", 0L, Some(9.0))).toDF("k", "t", "v")
    val got = EventStats.rollingWindowStats(df, "k", "t", "v", 5L)
      .select(col("k"), col("t_micros"), col("n_window"),
        col("sum_window"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    got should contain(("a", 0L, 1L, 1.0))
    got should contain(("a", 5000000L, 2L, 3.0))
    // both t=12s rows (RANGE ties) see: each other + t=5s+... window
    // is (7s, 12s]: only the two tied rows -> n=2, sum=4 (+0 for null)
    got.count(x => x._1 == "a" && x._2 == 12000000L &&
      x._3 == 2L && x._4 == 4.0) shouldBe 1
    got should contain(("b", 0L, 1L, 9.0))
  }

  test("rollingWindowStats plan: one hash exchange + sort, no " +
    "self-join") {
    import spark.implicits._
    val df = (1 to 500)
      .map(i => ((i % 20).toString, i.toLong * 1000000L, 1.0))
      .toDF("k", "t", "v").repartition(8)
    val out = EventStats.rollingWindowStats(df, "k", "t", "v", 60L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    "Exchange hashpartitioning".r.findAllIn(plan).length shouldBe 1
    plan shouldNot include("Join")
  }

  test("trendingItems: per-bucket top-k by count, ties to the " +
    "smaller item, null items dropped") {
    import spark.implicits._
    // bucket 0 (t in [0, 10s)): a x3, b x2, c x1; bucket 1: b x2, c x2
    val df = (Seq.fill(3)(("a", 1L)) ++ Seq.fill(2)(("b", 2L)) ++
      Seq(("c", 3L)) ++
      Seq.fill(2)(("b", 11L)) ++ Seq.fill(2)(("c", 12L)) ++
      Seq((null.asInstanceOf[String], 4L)))
      .map { case (i, s) => (i, s * 1000000L) }.toDF("item", "t")
    val got = EventStats.trendingItems(df, "t", "item",
      bucketSeconds = 10L, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    got shouldBe Set(
      (0L, "a", 3L, 1L), (0L, "b", 2L, 2L),
      (10000000L, "b", 2L, 1L), (10000000L, "c", 2L, 2L))
  }

  test("touchAttribution: first/last touch inside the lookback, " +
    "strictly before the conversion; unattributed -> NULLs") {
    import spark.implicits._
    val df = Seq(
      // user a: ad@1s, email@5s, buy@8s  (3s lookback: first+last=email)
      ("a", 1L, "ad", 1L), ("a", 5L, "email", 2L), ("a", 8L, "buy", 3L),
      // user a: second buy@9s (3s lookback reaches nothing: email@5s
      // is 4s older? 9-3=6 > 5 -> unattributed... wait: [6,9) misses 5)
      ("a", 9L, "buy", 4L),
      // user b: touch AT the conversion micro never self-attributes
      ("b", 5L, "ad", 5L), ("b", 5L, "buy", 6L),
      // user c: two touches inside the window -> first=ad, last=email
      ("c", 1L, "ad", 7L), ("c", 2L, "email", 8L), ("c", 3L, "buy", 9L))
      .map { case (k, s, ty, e) => (k, s * 1000000L, ty, e) }
      .toDF("k", "t", "ty", "eid")
    val got = EventStats.touchAttribution(df, "k", "t", "ty", "eid",
      Seq("ad", "email"), "buy", lookbackSeconds = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.getString(3)), Option(r.getString(5)))).toMap
    got(("a", 8000000L)) shouldBe ((Some("email"), Some("email")))
    got(("a", 9000000L)) shouldBe ((None, None))
    got(("b", 5000000L)) shouldBe ((None, None))
    got(("c", 3000000L)) shouldBe ((Some("ad"), Some("email")))
  }

  test("touchAttribution: equal-micro touches break ties by the tie " +
    "column (asc for first, desc for last)") {
    import spark.implicits._
    val df = Seq(
      ("u", 1L, "ad", 10L), ("u", 1L, "email", 20L),
      ("u", 4L, "buy", 30L))
      .map { case (k, s, ty, e) => (k, s * 1000000L, ty, e) }
      .toDF("k", "t", "ty", "eid")
    val r = EventStats.touchAttribution(df, "k", "t", "ty", "eid",
      Seq("ad", "email"), "buy", lookbackSeconds = 10L)
      .collect().head
    r.getString(3) shouldBe "ad"     // first: lower tie
    r.getString(5) shouldBe "email"  // last: higher tie
  }

  test("interArrivalStats: hand-computed gaps; single-event keys " +
    "report zero gaps with NULL stats") {
    import spark.implicits._
    // key a at 0s, 10s, 30s -> gaps 10, 20: mean 15, min 10, max 20,
    // std = sqrt(50) (sample), cv = sqrt(50)/15
    val df = Seq(("a", 0L), ("a", 10000000L), ("a", 30000000L),
      ("b", 5000000L))
      .toDF("k", "t")
    val got = EventStats.interArrivalStats(df, "k", "t")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    a.getLong(1) shouldBe 2L
    a.getDouble(2) shouldBe (15.0 +- 1e-9)
    a.getDouble(3) shouldBe (10.0 +- 1e-9)
    a.getDouble(4) shouldBe (20.0 +- 1e-9)
    a.getDouble(5) shouldBe (math.sqrt(50.0) +- 1e-9)
    a.getDouble(6) shouldBe (math.sqrt(50.0) / 15.0 +- 1e-9)
    val b = got("b")
    b.getLong(1) shouldBe 0L
    b.isNullAt(2) shouldBe true
    b.isNullAt(6) shouldBe true
  }

  test("concentration: uniform weights -> gini 0; extreme skew -> " +
    "gini near 1 and the top decile holds everything") {
    import spark.implicits._
    val uniform = (1 to 100).flatMap(k => Seq.fill(5)(s"k$k"))
      .toDF("key2")
    val u = EventStats.concentration(uniform, "key2").collect().head
    u.getLong(0) shouldBe 100L
    u.getDouble(2) shouldBe (0.0 +- 1e-9)
    u.getDouble(3) shouldBe (0.1 +- 1e-9)
    // one key with 10000 events, 99 keys with 1
    val skew = ((1 to 10000).map(_ => "hot") ++
      (1 to 99).map(i => s"cold$i")).toDF("key2")
    val sRow = EventStats.concentration(skew, "key2").collect().head
    sRow.getDouble(2) should be > 0.95
    sRow.getDouble(3) should be > 0.99
  }

  test("concentration with a value column weighs by the column sum") {
    import spark.implicits._
    // two keys, equal row counts, 9:1 value mass -> gini = 0.4
    // (x = [1, 9]: 2*(1*1+2*9)/(2*10) - 3/2 = 19/10 - 3/2 = 0.4)
    val df = Seq(("a", 0.5), ("a", 0.5), ("b", 4.5), ("b", 4.5))
      .toDF("k", "v")
    val r = EventStats.concentration(df, "k", Some("v")).collect().head
    r.getDouble(2) shouldBe (0.4 +- 1e-9)
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

  test("rfm: hand-computed scores; best metric earns the top tile") {
    import spark.implicits._
    // 5 users, each its own quintile: u1 most recent / most frequent /
    // biggest spender -> 555; u5 the opposite -> 111
    val rows = (1 to 5).flatMap { u =>
      val nEvents = 6 - u // u1: 5 events ... u5: 1 event
      (0 until nEvents).map { j =>
        (u.toLong, (100L - 10L * u + j) * 1000000L, (6 - u) * 10.0)
      }
    }
    val df = rows.toDF("user", "t", "v")
    val got = EventStats.rfm(df, "user", "t", "v", nTiles = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // u1 last event at (90+4)=94s, corpus max is also 94 -> recency 0
    got(1L)._1 shouldBe 0L
    got(1L)._2 shouldBe 5L      // frequency
    got(1L)._3 shouldBe 250.0   // 5 events x 50
    got(1L)._7 shouldBe 555L
    got(5L)._1 shouldBe (94L - 50L) // u5's single event is at 50s
    got(5L)._7 shouldBe 111L
    got(3L)._7 shouldBe 333L
    // every score in 1..5, rfm consistent with the digits
    got.values.foreach { v =>
      Seq(v._4, v._5, v._6).foreach(s => s should (be >= 1L and be <= 5L))
      v._7 shouldBe v._4 * 100 + v._5 * 10 + v._6
    }
  }

  test("rfm: ntile ties break by key, so replays and engines agree") {
    import spark.implicits._
    // four identical users -> tiles assigned purely by key order
    val df = (1 to 4).map(u => (u.toLong, 1000000L, 1.0))
      .toDF("user", "t", "v")
    val got = EventStats.rfm(df, "user", "t", "v", nTiles = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(7)).toMap
    got(1L) shouldBe 222L
    got(2L) shouldBe 222L
    got(3L) shouldBe 111L
    got(4L) shouldBe 111L
  }

  test("seasonality: integer-exact hour-of-week cells, shares sum to " +
    "1, lift is share x 168") {
    import spark.implicits._
    val day = 86400000000L; val hour = 3600000000L
    // epoch 0 = Thursday 00:00 UTC -> dow 3 (Monday = 0)
    val df = Seq(
      0L,                 // Thu 00
      0L,                 // Thu 00 (again)
      hour * 5,           // Thu 05
      day * 4,            // Mon 00 (1970-01-05)
      day * 4 + hour * 23 // Mon 23
    ).toDF("ts")
    val got = EventStats.seasonality(df, "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    got.keySet shouldBe Set((3L, 0L), (3L, 5L), (0L, 0L), (0L, 23L))
    got((3L, 0L))._1 shouldBe 2L
    got((3L, 0L))._2 shouldBe (0.4 +- 1e-12)
    got((3L, 0L))._3 shouldBe (0.4 * 168 +- 1e-9)
    got.values.map(_._2).sum shouldBe (1.0 +- 1e-12)
  }

  test("rfm closed-form ntile == Spark's ntile window for every key, " +
    "across key counts and tile counts (incl. fewer keys than tiles)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (nKeys <- Seq(3, 7, 10, 23); tiles <- Seq(2, 3, 5, 7)) {
      // key u has u events, staggered last-times, varied spend; some
      // monetary ties (spend depends on u % 4) exercise the tie-break
      val rows = (1 to nKeys).flatMap { u =>
        (0 until u).map(j => (u.toLong, (u * 50L + j) * 1000000L,
          (u % 4) * 10.0))
      }
      val df = rows.toDF("user", "t", "v")
      val got = EventStats.rfm(df, "user", "t", "v", nTiles = tiles)
        .select("key", "r_score", "f_score", "m_score")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      // oracle: the pre-prefix-sum formulation — ntile windows over the
      // same per-key aggregate and tie-break orderings
      val agg = df.groupBy(col("user").as("key"))
        .agg(max(col("t")).as("__last"), count(lit(1)).as("frequency"),
          sum(col("v")).as("monetary"))
      val ref = agg.agg(max(col("__last")).as("__ref"))
      val base = agg.crossJoin(broadcast(ref))
        .select(col("key"),
          expr("(__ref - __last) div 1000000").as("recency_s"),
          col("frequency"), col("monetary"))
      val want = base
        .withColumn("r_score", (lit(tiles + 1) - ntile(tiles).over(
          Window.orderBy(col("recency_s").asc, col("key").asc)))
          .cast("long"))
        .withColumn("f_score", (lit(tiles + 1) - ntile(tiles).over(
          Window.orderBy(col("frequency").desc, col("key").asc)))
          .cast("long"))
        .withColumn("m_score", (lit(tiles + 1) - ntile(tiles).over(
          Window.orderBy(round(col("monetary"), 6).desc,
            col("key").asc))).cast("long"))
        .collect().map(r => r.getAs[Long]("key") ->
          (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
            r.getAs[Long]("m_score"))).toMap
      withClue(s"nKeys=$nKeys tiles=$tiles: ") { got shouldBe want }
    }
  }
}
