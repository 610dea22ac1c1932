package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** The skew/band/as-of join strategies must return exactly the rows the
  * straightforward formulations return — the strategies only change the
  * physical shuffle shape.
  */
class JoinsSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // hot key: 'x' carries 80% of the left side
    val large = (1 to 1000).map(i =>
      (if (i <= 800) "x" else s"k${i % 50}", i)).toDF("key", "v")
    val small = Seq(("x", 100), ("k1", 200), ("k7", 300)).toDF("key", "w")

    val plain = large.join(small, "key")
      .select(col("key"), col("v"), col("w"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
    val salted = Joins.saltedJoin(large, small, "key", saltBuckets = 8)
      .select(col("key"), col("v"), col("w"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted

    salted shouldBe plain
    plain.length shouldBe (800 + 4 + 4) // hot key + 4 rows each for k1/k7
  }

  test("autoJoin routes by the measured skew and matches the plain join") {
    import spark.implicits._
    val hot = (1 to 1000).map(i =>
      (if (i <= 800) "x" else s"k${i % 50}", i)).toDF("key", "v")
    val uniform = (1 to 1000).map(i => (s"k${i % 100}", i)).toDF("key", "v")
    val small = Seq(("x", 100), ("k1", 200), ("k7", 300)).toDF("key", "w")

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("key"), col("v"), col("w"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted

    // hot key (80% share) -> salted path: the join key carries the salt
    // (ConvertToLocalRelation folds the xxhash64 itself on Seq-backed
    // frames, so pin the salt column, not the hash expression)
    val hotJoin = Joins.autoJoin(hot, small, "key", saltBuckets = 8)
    rows(hotJoin) shouldBe rows(hot.join(small, "key"))
    hotJoin.queryExecution.optimizedPlan.toString should include ("__salt")

    // uniform keys (1% top share) -> plain equi-join, no salt machinery
    val uniJoin = Joins.autoJoin(uniform, small, "key")
    rows(uniJoin) shouldBe rows(uniform.join(small, "key"))
    (uniJoin.queryExecution.optimizedPlan.toString should not).include("__salt")
  }

  test("the q110 driver query's skewed regime fires the salted plan") {
    // the CORRECTNESS row proves the answer matches the plain join;
    // this pins that it proved it THROUGH the salt path (half the
    // events collapse onto key 0, far past the 5% threshold)
    val df = graft.SparkEntry.queries("q110_auto_join")(spark, sfDir)
    df.queryExecution.optimizedPlan.toString should include("__salt")
  }

  test("range bucket join equals the naive BETWEEN join") {
    import spark.implicits._
    val points = (1 to 500).map(i => (i, i * 0.7)).toDF("id", "value")
    val ranges = Seq((1, 10.0, 25.0), (2, 100.0, 110.0), (3, 300.0, 340.0))
      .toDF("rid", "lo", "hi")

    val naive = points.crossJoin(ranges)
      .filter(col("value") >= col("lo") && col("value") <= col("hi"))
      .select(col("id"), col("rid"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    val bucketed = Joins.rangeBucketJoin(points, ranges, "value", "lo", "hi",
      bucketWidth = 16.0)
      .select(col("id"), col("rid"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted

    bucketed shouldBe naive
    naive should not be empty
  }

  test("as-of join picks the latest right row at or before each left time") {
    import spark.implicits._
    val trades = Seq(
      ("A", 10L, "t1"), ("A", 25L, "t2"), ("B", 12L, "t3"), ("A", 5L, "t0"))
      .toDF("sym", "ts", "trade")
    val quotes = Seq(
      ("A", 8L, 100.0), ("A", 10L, 101.0), ("A", 20L, 102.0),
      ("B", 15L, 50.0))
      .toDF("sym", "qts", "px")

    val result = Joins.asOfJoin(trades, quotes, "sym", "ts", "qts", Seq("px"))
      .select(col("trade"), col("px"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    result("t0") shouldBe None // no quote at or before ts=5
    result("t1") shouldBe Some(101.0) // exact-time quote visible
    result("t2") shouldBe Some(102.0) // latest at ts<=25
    result("t3") shouldBe None // B's only quote is after ts=12
  }

  test("as-of join: a newer null payload wins over an older non-null one") {
    import spark.implicits._
    val trades = Seq(("A", 30L, "t1"), ("A", 15L, "t2")).toDF("sym", "ts", "trade")
    val quotes = Seq(
      ("A", 10L, Some(100.0)),
      ("A", 20L, None)) // latest quote before t1 has a NULL px
      .toDF("sym", "qts", "px")

    val result = Joins.asOfJoin(trades, quotes, "sym", "ts", "qts", Seq("px"))
      .select(col("trade"), col("px"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    // standard ASOF semantics: the ts=20 row matches t1 even though its
    // payload is null — it must NOT fall back to the stale ts=10 value
    result("t1") shouldBe None
    result("t2") shouldBe Some(100.0)
  }

  test("bucketed as-of join equals plain as-of join under a hot key") {
    import spark.implicits._
    // one key owns 50% of both sides; times interleave so matches cross
    // bucket boundaries in both directions
    val rnd = new scala.util.Random(7)
    val trades = (1 to 2000).map { i =>
      val sym = if (i % 2 == 0) "HOT" else s"s${i % 37}"
      (sym, rnd.nextInt(100000).toLong, s"t$i")
    }.toDF("sym", "ts", "trade")
    val quotes = (1 to 2000).map { i =>
      val sym = if (i % 2 == 0) "HOT" else s"s${i % 41}"
      // distinct quote times per key (i rides in the low bits) so the
      // as-of winner is deterministic on both plans
      (sym, rnd.nextInt(50).toLong * 4096 + i, i * 1.0)
    }.toDF("sym", "qts", "px")

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("trade"), col("px"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val plain = rows(Joins.asOfJoinWindowed(trades, quotes, "sym", "ts", "qts", Seq("px")))
    val bucketed = rows(Joins.asOfJoinBucketed(
      trades, quotes, "sym", "ts", "qts", Seq("px"), bucketWidth = 8192.0))
    bucketed shouldBe plain
    plain.values.count(_.isDefined) should be > 0

    // the DEFAULT entry point must take the skew-safe path on this data
    // (nondegenerate time range) and still return the identical rows
    val deflt = Joins.asOfJoin(trades, quotes, "sym", "ts", "qts", Seq("px"))
    rows(deflt) shouldBe plain
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(deflt.queryExecution.optimizedPlan.toString)
      .map(_.group(1)).toSeq
    winSpecs.exists(s => s.contains("sym") && s.contains("__bucket")) shouldBe true
  }

  test("default as-of join falls back to windowed on a degenerate range") {
    import spark.implicits._
    val trades = Seq(("A", 10L, "t1"), ("A", 5L, "t0")).toDF("sym", "ts", "trade")
    val oneInstant = Seq(("A", 7L, 1.0)).toDF("sym", "qts", "px")
    val got = Joins.asOfJoin(trades, oneInstant, "sym", "ts", "qts", Seq("px"))
      .select(col("trade"), col("px"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    got("t1") shouldBe Some(1.0)
    got("t0") shouldBe None
    val empty = oneInstant.filter(lit(false))
    val gotE = Joins.asOfJoin(trades, empty, "sym", "ts", "qts", Seq("px"))
      .select(col("trade"), col("px")).collect()
    gotE.length shouldBe 2
    gotE.forall(_.isNullAt(1)) shouldBe true
  }

  test("bucketed as-of join: within-bucket window partitions by bucket") {
    import spark.implicits._
    val trades = Seq(("A", 10L, "t1"), ("A", 25L, "t2")).toDF("sym", "ts", "trade")
    val quotes = Seq(("A", 8L, 1.0), ("A", 20L, 2.0)).toDF("sym", "qts", "px")
    val res = Joins.asOfJoinBucketed(trades, quotes, "sym", "ts", "qts",
      Seq("px"), bucketWidth = 16.0)
    // the event-granular window must be keyed by (sym, __bucket) — the
    // skew bound depends on it; only the bucket-granular carry window may
    // partition by the key alone
    val winSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(res.queryExecution.optimizedPlan.toString)
      .map(_.group(1)).toSeq
    winSpecs.exists(s => s.contains("sym") && s.contains("__bucket")) shouldBe true
    res.select(col("trade"), col("px")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet shouldBe
      Set(("t1", 1.0), ("t2", 2.0))
  }

  test("bucketed as-of join: newer null payload wins, payloads move as one") {
    import spark.implicits._
    val trades = Seq(("A", 30L, "t1"), ("A", 15L, "t2")).toDF("sym", "ts", "trade")
    val quotes = Seq(
      ("A", 10L, Some(100.0), Some("old")),
      ("A", 20L, None, Some("new")))
      .toDF("sym", "qts", "px", "src")
    // bucketWidth 8: quote ts=10 lands in bucket 1, trade ts=30 in bucket
    // 3, quote ts=20 in bucket 2 — the match crosses buckets via the carry
    val rows = Joins.asOfJoinBucketed(trades, quotes, "sym", "ts", "qts",
      Seq("px", "src"), bucketWidth = 8.0)
      .select(col("trade"), col("px"), col("src"))
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))), r.getString(2)))
      .toMap
    rows("t1") shouldBe ((None, "new")) // carried row wins whole, no mixing
    rows("t2") shouldBe ((Some(100.0), "old"))
  }

  test("as-of join with multiple payload columns moves them as one row") {
    import spark.implicits._
    val trades = Seq(("A", 30L, "t1")).toDF("sym", "ts", "trade")
    val quotes = Seq(
      ("A", 10L, Some(1.0), Some("old")),
      ("A", 20L, None, Some("new")))
      .toDF("sym", "qts", "px", "src")

    val row = Joins.asOfJoin(trades, quotes, "sym", "ts", "qts",
      Seq("px", "src")).select(col("px"), col("src")).collect().head
    // both payloads come from the SAME (latest) right row — no mixing of
    // px from ts=10 with src from ts=20
    row.isNullAt(0) shouldBe true
    row.getString(1) shouldBe "new"
  }

  test("as-of join on TIMESTAMP and TIMESTAMP_NTZ time columns equals " +
    "the raw-micros join (both plans)") {
    import spark.implicits._
    // adjacent-micro times force micro-exact comparison: an engine that
    // rounds through float seconds would merge t=...000 and t=...001
    val base = 1700000000000000L // epoch micros
    val tradesUs = Seq(("A", base, "t0"), ("A", base + 1, "t1"),
      ("A", base + 3600000000L, "t2"), ("B", base + 2, "t3"))
      .toDF("sym", "us", "trade")
    val quotesUs = Seq(("A", base, 1.0), ("A", base + 1, 2.0),
      ("A", base + 1800000000L, 3.0), ("B", base + 3, 4.0))
      .toDF("sym", "us", "px")
    def withTs(df: org.apache.spark.sql.DataFrame, t: String) =
      df.withColumn("ts", timestamp_micros(col("us")).cast(t)).drop("us")
    val expectRaw = Joins.asOfJoin(
        tradesUs.withColumnRenamed("us", "ts"),
        quotesUs.withColumnRenamed("us", "ts").withColumnRenamed("ts", "qts"),
        "sym", "ts", "qts", Seq("px"))
      .select(col("trade"), col("px")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    for (t <- Seq("timestamp", "timestamp_ntz")) {
      val trades = withTs(tradesUs, t)
      val quotes = withTs(quotesUs, t).withColumnRenamed("ts", "qts")
      for (res <- Seq(
        Joins.asOfJoin(trades, quotes, "sym", "ts", "qts", Seq("px")),
        Joins.asOfJoinBucketed(trades, quotes, "sym", "ts", "qts",
          Seq("px"), bucketWidth = 600.0))) {
        val got = res.select(col("trade"), col("px")).collect()
          .map(r => r.getString(0) ->
            (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
        withClue(s"time type $t: ") { got shouldBe expectRaw }
      }
    }
    expectRaw("t1") shouldBe Some(2.0) // micro-adjacent quote resolved
  }
}
