package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase

/** Round-13 model-eval family extensions: average precision against
  * hand-computed PR curves, the threshold operating-point report,
  * per-query ranking metrics, plus the series autocorrelation and
  * exact-quantile machinery they share prefix sums with.
  */
class ModelEvalExtSpec extends AnyFunSuite with Matchers
    with SparkSuiteBase {

  test("averagePrecision: perfect ranking 1.0; hand-computed mixed " +
    "case; all-tied equals the base rate; no positives is NULL") {
    import spark.implicits._
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false),
      (0.1, false)).toDF("s", "y")
    ModelEval.averagePrecision(perfect, "s", "y").collect().head
      .getDouble(2) shouldBe (1.0 +- 1e-12)

    // desc: 0.9 pos | 0.8 neg | 0.7 pos | 0.6 pos | 0.5 neg
    // AP = (1/3)(1/1) + (1/3)(2/3) + (1/3)(3/4) = 0.805555...
    val mixed = Seq((0.9, true), (0.8, false), (0.7, true),
      (0.6, true), (0.5, false)).toDF("s", "y")
    ModelEval.averagePrecision(mixed, "s", "y").collect().head
      .getDouble(2) shouldBe ((1.0 + 2.0 / 3 + 3.0 / 4) / 3 +- 1e-12)

    // one tie group: precision at its single threshold IS the base rate
    val tied = Seq((0.5, true), (0.5, false), (0.5, false),
      (0.5, true)).toDF("s", "y")
    ModelEval.averagePrecision(tied, "s", "y").collect().head
      .getDouble(2) shouldBe (0.5 +- 1e-12)

    val nopos = Seq((0.5, false), (0.2, false)).toDF("s", "y")
    val r = ModelEval.averagePrecision(nopos, "s", "y").collect().head
    r.getLong(0) shouldBe 0L
    r.isNullAt(2) shouldBe true
  }

  test("thresholdReport: hand-computed confusion + derived metrics; " +
    "empty-denominator ratios are NULL") {
    import spark.implicits._
    // scores/labels: 0.9+ 0.7- 0.6+ 0.3- ; threshold 0.5:
    // tp=2 fp=1 fn=0 tn=1
    val df = Seq((0.9, true), (0.7, false), (0.6, true), (0.3, false))
      .toDF("s", "y")
    val rows = ModelEval.thresholdReport(df, "s", "y", Seq(0.5, 0.95))
      .orderBy("threshold").collect()
    val at05 = rows(0)
    at05.getLong(1) shouldBe 2L // tp
    at05.getLong(2) shouldBe 1L // fp
    at05.getLong(3) shouldBe 0L // fn
    at05.getLong(4) shouldBe 1L // tn
    at05.getDouble(5) shouldBe (0.75 +- 1e-12) // accuracy
    at05.getDouble(6) shouldBe (2.0 / 3 +- 1e-12) // precision
    at05.getDouble(7) shouldBe (1.0 +- 1e-12) // recall
    at05.getDouble(8) shouldBe (0.8 +- 1e-12) // f1
    // mcc = (2*1 - 1*0)/sqrt(3*2*2*1) = 2/sqrt(12)
    at05.getDouble(9) shouldBe (2.0 / math.sqrt(12.0) +- 1e-12)
    // po=0.75, pe=(3*2 + 1*2)/16 = 0.5 -> kappa = 0.5
    at05.getDouble(10) shouldBe (0.5 +- 1e-12)
    // threshold 0.95: tp=0 fp=0 -> precision NULL, f1 NULL
    val at95 = rows(1)
    at95.getLong(1) shouldBe 0L
    at95.isNullAt(6) shouldBe true
    at95.isNullAt(8) shouldBe true
  }

  test("rankingReport: hand-computed NDCG/RR/precision/recall at k=2; " +
    "no-relevant query has NULL ndcg/recall and rr 0") {
    import spark.implicits._
    // query a: items ranked by score desc: i1(rel 3), i2(rel 0),
    //   i3(rel 1) -> dcg@2 = 3/log2(2) = 3; ideal: rel 3,1 ->
    //   idcg = 3 + 1/log2(3); rr = 1; hits@2 = 1; n_rel = 2
    // query b: no relevant items
    val df = Seq(
      ("a", "i1", 0.9, 3.0), ("a", "i2", 0.8, 0.0), ("a", "i3", 0.7, 1.0),
      ("b", "j1", 0.9, 0.0), ("b", "j2", 0.8, 0.0))
      .toDF("q", "i", "s", "r")
    val rows = ModelEval.rankingReport(df, "q", "i", "s", "r", k = 2)
      .orderBy("q").collect()
    val a = rows(0)
    a.getLong(1) shouldBe 3L
    a.getLong(2) shouldBe 2L
    a.getDouble(3) shouldBe (3.0 +- 1e-12)
    a.getDouble(4) shouldBe
      (3.0 / (3.0 + 1.0 / (math.log(3.0) / math.log(2.0))) +- 1e-12)
    a.getDouble(5) shouldBe (1.0 +- 1e-12)
    a.getDouble(6) shouldBe (0.5 +- 1e-12)  // 1 hit / k=2
    a.getDouble(7) shouldBe (0.5 +- 1e-12)  // 1 hit / 2 relevant
    val b = rows(1)
    b.getLong(2) shouldBe 0L
    b.isNullAt(4) shouldBe true
    b.getDouble(5) shouldBe (0.0 +- 1e-12)
    b.getDouble(6) shouldBe (0.0 +- 1e-12)
    b.isNullAt(7) shouldBe true
  }

  test("rankingReport: score ties break by item ascending (matches " +
    "the oracle's row_number order)") {
    import spark.implicits._
    val df = Seq(("a", "i2", 0.9, 1.0), ("a", "i1", 0.9, 0.0))
      .toDF("q", "i", "s", "r")
    // i1 ranks first (tie broken by item), so rr = 1/2
    ModelEval.rankingReport(df, "q", "i", "s", "r", k = 1)
      .collect().head.getDouble(5) shouldBe (0.5 +- 1e-12)
  }

  test("acf: alternating series hand case; constant series is NULL; " +
    "gaps drop pairs") {
    import spark.implicits._
    // v = 1,0,1,0,1,0: mu=0.5, den=1.5; lag1 = -1.25/1.5, lag2 = 1/1.5
    val s = Seq((0L, 1.0), (1L, 0.0), (2L, 1.0), (3L, 0.0), (4L, 1.0),
      (5L, 0.0)).toDF("t", "v")
    val got = EventStats.acf(s, "t", "v", maxLag = 2)
      .orderBy("lag").collect()
    got(0).getLong(1) shouldBe 5L
    got(0).getDouble(2) shouldBe (-1.25 / 1.5 +- 1e-12)
    got(1).getLong(1) shouldBe 4L
    got(1).getDouble(2) shouldBe (1.0 / 1.5 +- 1e-12)

    val const = Seq((0L, 2.0), (1L, 2.0), (2L, 2.0)).toDF("t", "v")
    EventStats.acf(const, "t", "v", 1).collect().head
      .isNullAt(2) shouldBe true

    // missing t=2: lag-1 pairs only (0,1) and (3,4)
    val gappy = Seq((0L, 1.0), (1L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("t", "v")
    EventStats.acf(gappy, "t", "v", 1).collect().head
      .getLong(1) shouldBe 2L
  }

  test("acf: zero-pair lags surface as (n_pairs=0, acf NULL) rows, " +
    "never gaps — one row per lag 1..maxLag always") {
    import spark.implicits._
    // 3 points, maxLag 5: lags 3..5 exceed the span -> explicit empties
    val s = Seq((0L, 1.0), (1L, 3.0), (2L, 2.0)).toDF("t", "v")
    val got = EventStats.acf(s, "t", "v", maxLag = 5)
      .orderBy("lag").collect()
    got.map(_.getInt(0)).toSeq shouldBe Seq(1, 2, 3, 4, 5)
    got.map(_.getLong(1)).toSeq shouldBe Seq(2L, 1L, 0L, 0L, 0L)
    got.drop(2).foreach(_.isNullAt(2) shouldBe true)
  }

  test("eventAcf: empty buckets between first and last event count " +
    "as zeros") {
    import spark.implicits._
    // events at micros 0, 1s, 4s -> 1s buckets: [1,1,0,0,1]
    val ev = Seq(0L, 1000000L, 4000000L).toDF("ts")
    val got = EventStats.eventAcf(ev, "ts", bucketSeconds = 1L,
      maxLag = 1).collect().head
    got.getLong(1) shouldBe 4L
    // v = 1,1,0,0,1: mu=0.6, den=5*0.24=1.2
    // lag1: (0.4)(0.4)+(0.4)(-0.6)+(-0.6)(-0.6)+(-0.6)(0.4) = 0.04
    got.getDouble(2) shouldBe (0.04 / 1.2 +- 1e-12)
  }

  test("exactQuantiles: quantile_disc rank rule on 1..10; grouped " +
    "path agrees with the global path per group") {
    import spark.implicits._
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val got = FeatureScale.exactQuantiles(df, "v",
      Seq(0.0, 0.25, 0.5, 0.9, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    got(0.0) shouldBe 1.0
    got(0.25) shouldBe 3.0 // ceil(2.5)
    got(0.5) shouldBe 5.0  // ceil(5) on n=10
    got(0.9) shouldBe 9.0
    got(1.0) shouldBe 10.0

    val grouped = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 10.0), ("b", 20.0)).toDF("g", "v")
    val gq = FeatureScale.exactQuantiles(grouped, "v", Seq(0.5),
      keys = Seq("g")).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    gq("a") shouldBe 2.0 // ceil(1.5) = 2nd
    gq("b") shouldBe 10.0 // ceil(1) = 1st
    // global path on each group's slice agrees
    FeatureScale.exactQuantiles(grouped.filter(col("g") === "a"), "v",
      Seq(0.5)).collect().head.getDouble(2) shouldBe 2.0
  }

  test("weightedQuantiles: weight-expanded equals row-expanded; " +
    "non-positive weights carry no rank") {
    import spark.implicits._
    // (value, weight): 1x5, 2x1, 3x4 -> expanded [1,1,1,1,1,2,3,3,3,3]
    val wdf = Seq((1.0, 5L), (2.0, 1L), (3.0, 4L), (4.0, 0L),
      (5.0, -2L)).toDF("v", "w")
    val got = FeatureScale.weightedQuantiles(wdf, "v", col("w"),
      Seq(0.1, 0.5, 0.6, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val expanded = Seq.fill(5)(1.0) ++ Seq(2.0) ++ Seq.fill(4)(3.0)
    Seq(0.1, 0.5, 0.6, 1.0).foreach { q =>
      val rank = math.max(1, math.ceil(q * expanded.size).toLong)
      got(q) shouldBe expanded((rank - 1).toInt)
    }
  }

  test("exactQuantiles: fuzz vs sort-based order statistics") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val vals = Seq.fill(237)(rnd.nextInt(40).toDouble)
    val qs = Seq(0.01, 0.1, 0.37, 0.5, 0.73, 0.99)
    val got = FeatureScale.exactQuantiles(vals.toDF("v"), "v", qs)
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val rank = math.max(1, math.ceil(q * vals.size).toLong)
      got(q) shouldBe sorted((rank - 1).toInt)
    }
  }
}
