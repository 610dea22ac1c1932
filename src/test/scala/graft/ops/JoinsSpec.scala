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
}
